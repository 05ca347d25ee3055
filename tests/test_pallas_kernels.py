"""Pallas kernel coverage on CPU via interpret mode (tiny shapes).

The real TPU runs are validated manually/in bench; these keep the kernels
from regressing in CPU-only CI runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viennaray_tpu as vrt
from viennaray_tpu.io import fixtures
from viennaray_tpu.ops import intersect, pallas_intersect as PI


def _rays(n, z, lo=-1.5, hi=1.5, seed=0):
    key = jax.random.PRNGKey(seed)
    org = jax.random.uniform(key, (n, 3), minval=lo, maxval=hi).astype(
        jnp.float32
    )
    org = org.at[:, 2].set(z)
    th = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n,)) * 0.6
    d = jnp.stack(
        [jnp.sin(th) * 0.4, jnp.cos(th) * 0.4, -jnp.ones(n)], axis=1
    )
    return org, d / jnp.linalg.norm(d, axis=1, keepdims=True)


def test_pallas_disk_kernel_interpret_matches_xla():
    pts, nrm = fixtures.create_plane_grid(0.5, 1.5, (0, 1, 2))
    geo = vrt.DiskGeometry.build(pts, nrm, 0.5, dim=3)
    org, d = _rays(512, 0.6)
    tp, ip, hp = PI.disk_nearest_hit_pallas(
        org, d, geo.prims_soa, geo.soa_perm, geo.soa_chunk_bbs,
        rt=256, interpret=True,
    )
    tb, ib, hb = intersect.disk_nearest_hit(
        org, d, geo.points, geo.normals, geo.radii, 1e-4
    )
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hb))
    m = np.asarray(hp)
    np.testing.assert_allclose(
        np.asarray(tp)[m], np.asarray(tb)[m], rtol=1e-4
    )


def test_pallas_triangle_kernel_interpret_matches_xla():
    n = 4
    xs = np.linspace(-1.5, 1.5, n + 1)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack(
        [uu.ravel(), vv.ravel(), np.zeros((n + 1) ** 2)], axis=1
    ).astype(np.float32)
    tris = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            tris.append([a, a + 1, a + n + 1])
            tris.append([a + 1, a + n + 2, a + n + 1])
    tris = np.array(tris, np.int32)
    geo = vrt.TriangleGeometry.build(verts, tris, 0.75, dim=3)
    org, d = _rays(512, 0.6)
    tp, ip, hp = PI.triangle_nearest_hit_pallas(
        org, d, geo.prims_soa, geo.soa_perm, geo.soa_chunk_bbs,
        rt=256, interpret=True,
    )
    tb, ib, hb = intersect.triangle_nearest_hit(
        org, d, geo.vertices, geo.triangles, 1e-4
    )
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hb))
    m = np.asarray(hp)
    np.testing.assert_allclose(
        np.asarray(tp)[m], np.asarray(tb)[m], rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ip)[m], np.asarray(ib)[m])
