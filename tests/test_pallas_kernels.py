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


def test_flux_histogram_matches_numpy():
    """Pallas VMEM-one-hot histogram == np.add.at (interpret mode)."""
    import numpy as np

    from viennaray_tpu.ops.pallas_histogram import flux_histogram

    rng = np.random.default_rng(11)
    for E, n in [(1000, 300), (4096, 9000), (777, 2993)]:
        ids = rng.integers(0, n, E).astype(np.int32)
        w = rng.random(E).astype(np.float32)
        ref = np.zeros(n, np.float32)
        np.add.at(ref, ids, w)
        got = np.asarray(
            flux_histogram(jnp.asarray(ids), jnp.asarray(w), n, interpret=True)
        )
        rel = np.abs(got - ref).max() / ref.max()
        assert rel < 1e-5, (E, n, rel)


def test_fused_bounce_multi_matches_sequential():
    """n_sub=2 megakernel == two n_sub=1 calls when fed the same uniforms.

    The in-kernel bounce arithmetic is identical; only the batching of the
    hit records differs, so final ray state must agree bitwise."""
    import numpy as np

    from viennaray_tpu.config import BoundaryCondition, ReflectionKind
    from viennaray_tpu.geometry.disk_geometry import DiskGeometry
    from viennaray_tpu.io import fixtures
    from viennaray_tpu.ops import pallas_bounce

    pts, nrm = fixtures.create_trench_grid_3d(
        grid_delta=0.5, extent=3.0, trench_width=2.0, trench_depth=2.0
    )
    geo = DiskGeometry.build(pts, nrm, grid_delta=0.5)
    R = 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    org = jnp.stack(
        [
            jax.random.uniform(k1, (R,), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (R,), minval=-2.0, maxval=2.0),
            jnp.full((R,), 3.5),
        ],
        axis=1,
    )
    dirn = jnp.tile(jnp.asarray([[0.1, 0.0, -0.99]]), (R, 1))
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    w = jnp.ones((R, 1), jnp.float32)
    flags = jnp.concatenate(
        [jnp.ones((R, 1)), jnp.zeros((R, 3))], axis=1
    ).astype(jnp.float32)
    uni = jax.random.uniform(k3, (R, 6), dtype=jnp.float32)
    walls = jnp.asarray(
        [[-3.25, 3.25, -3.25, 3.25, -2.0, 3.6, 0.55, 0.0]], jnp.float32
    )
    stick = jnp.asarray([[0.3]], jnp.float32)
    kw = dict(
        t_near=1e-4, dim=3, first_dir=0, second_dir=1, ray_axis=2,
        bc1=BoundaryCondition.PERIODIC, bc2=BoundaryCondition.PERIODIC,
        refl_kind=ReflectionKind.DIFFUSE, interpret=True,
    )
    o2, d2, w2, f2, st2, fl2 = pallas_bounce.fused_bounce(
        org, dirn, w, w, flags, uni, geo.prims_soa, geo.soa_chunk_bbs,
        walls, stick, n_sub=2, **kw
    )
    oa, da, wa, fa, sta, fla = pallas_bounce.fused_bounce(
        org, dirn, w, w, flags, uni[:, 0:3], geo.prims_soa,
        geo.soa_chunk_bbs, walls, stick, n_sub=1, **kw
    )
    ob, db, wb, fb, stb, flb = pallas_bounce.fused_bounce(
        oa, da, wa, w, fa, uni[:, 3:6], geo.prims_soa, geo.soa_chunk_bbs,
        walls, stick, n_sub=1, **kw
    )
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(ob))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(db))
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(fb))
    np.testing.assert_array_equal(
        np.asarray(st2), np.asarray(sta) + np.asarray(stb)
    )
    # in-kernel flux: per-chunk accumulation order is identical
    np.testing.assert_array_equal(
        np.asarray(fl2), np.asarray(fla) + np.asarray(flb)
    )
    # at least some rays actually collided in bounce 1 (test is non-vacuous)
    assert float(np.asarray(sta)[:, 0].sum()) > 50
    # collisions actually deposited flux
    assert float(np.asarray(fl2).sum()) > 0.0


def test_fused_bounce_per_material_sticking():
    """per_mat megakernel: a constant per-prim table equals the scalar path
    bitwise; a varying table lands each collided ray's weight exactly on
    w*(1-s[mat]) for one of the table's entries."""
    import numpy as np

    from viennaray_tpu.config import BoundaryCondition, ReflectionKind
    from viennaray_tpu.geometry.disk_geometry import DiskGeometry
    from viennaray_tpu.io import fixtures
    from viennaray_tpu.ops import pallas_bounce

    pts, nrm = fixtures.create_trench_grid_3d(
        grid_delta=0.5, extent=3.0, trench_width=2.0, trench_depth=2.0
    )
    geo = DiskGeometry.build(pts, nrm, grid_delta=0.5)
    npad = geo.prims_soa.shape[1]
    R = 256
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    org = jnp.stack(
        [
            jax.random.uniform(k1, (R,), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (R,), minval=-2.0, maxval=2.0),
            jnp.full((R,), 3.5),
        ],
        axis=1,
    )
    dirn = jnp.tile(jnp.asarray([[0.05, 0.0, -0.999]]), (R, 1))
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    w = jnp.ones((R, 1), jnp.float32)
    flags = jnp.concatenate(
        [jnp.ones((R, 1)), jnp.zeros((R, 3))], axis=1
    ).astype(jnp.float32)
    uni = jax.random.uniform(k3, (R, 3), dtype=jnp.float32)
    walls = jnp.asarray(
        [[-3.25, 3.25, -3.25, 3.25, -2.0, 3.6, 0.55, 0.0]], jnp.float32
    )
    kw = dict(
        t_near=1e-4, dim=3, first_dir=0, second_dir=1, ray_axis=2,
        bc1=BoundaryCondition.PERIODIC, bc2=BoundaryCondition.PERIODIC,
        refl_kind=ReflectionKind.DIFFUSE, interpret=True, n_sub=1,
        roulette=False,
    )
    args = (org, dirn, w, w, flags, uni, geo.prims_soa, geo.soa_chunk_bbs,
            walls)

    # constant table == scalar, bitwise
    s = 0.3
    out_scalar = pallas_bounce.fused_bounce(
        *args, jnp.asarray([[s]], jnp.float32), per_mat=False, **kw
    )
    out_table = pallas_bounce.fused_bounce(
        *args, jnp.full((1, npad), s, jnp.float32), per_mat=True, **kw
    )
    for a, b in zip(out_scalar, out_table):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # varying table: material = (z < 0), sticking 0.25 below / 0.75 above
    z_sorted = np.asarray(geo.prims_soa)[2]
    table = np.where(z_sorted < 0.0, 0.25, 0.75).astype(np.float32)
    o, d, w_out, f, st, fl = pallas_bounce.fused_bounce(
        *args, jnp.asarray(table[None, :]), per_mat=True, **kw
    )
    collided = np.asarray(st)[:, 0] > 0.5
    assert collided.sum() > 50
    wv = np.asarray(w_out)[collided, 0]
    ok = np.isclose(wv, 0.75) | np.isclose(wv, 0.25) | np.isclose(wv, 0.0)
    assert ok.all(), wv[~ok][:5]
