"""Native (C++/ctypes) host accel vs numpy fallback equivalence."""

import numpy as np
import pytest

from viennaray_tpu.utils import native


def _numpy_neighborhood(points, distance, dim):
    """Reference brute-force predicate (rayPointNeighborhood.hpp:287-298)."""
    pts = np.asarray(points, np.float64)[:, :dim]
    d = pts[:, None, :] - pts[None, :, :]
    within = (np.abs(d) <= distance).all(-1) & (
        np.sum(d * d, -1) <= distance * distance
    )
    np.fill_diagonal(within, False)
    return within


@pytest.mark.skipif(native.load() is None, reason="native lib unavailable")
def test_native_neighborhood_matches_brute_force():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, size=(500, 3))
    for dim in (2, 3):
        nbrs, counts = native.build_neighborhood_native(pts, 0.5, dim)
        within = _numpy_neighborhood(pts, 0.5, dim)
        for i in range(len(pts)):
            got = set(nbrs[i][nbrs[i] >= 0].tolist())
            expect = set(np.nonzero(within[i])[0].tolist())
            assert got == expect, (dim, i)
            assert counts[i] == len(expect)


@pytest.mark.skipif(native.load() is None, reason="native lib unavailable")
def test_native_neighborhood_flat_geometry_no_duplicates():
    """Regression: flat geometry collapses a grid axis to span 1, which made
    distinct cell offsets alias to the same cell and emit every neighbor
    multiple times (inflating disk multi-hit flux by ~40%)."""
    xs = np.arange(-2.0, 2.0 + 1e-9, 0.1)
    pts = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=1)
    for dim in (2, 3):
        nbrs, counts = native.build_neighborhood_native(pts, 0.1415, dim)
        for i in range(len(pts)):
            row = nbrs[i][nbrs[i] >= 0]
            assert len(row) == len(set(row.tolist())), (dim, i, row)
        # interior points have exactly 2 neighbors at spacing 0.1
        assert counts[5] == 2


@pytest.mark.skipif(native.load() is None, reason="native lib unavailable")
def test_native_grid_matches_numpy():
    import os

    from viennaray_tpu.geometry import grid_accel

    rng = np.random.default_rng(2)
    pts = rng.uniform(-3, 3, size=(400, 3))
    r = np.full(400, 0.2)

    g_native = grid_accel.build_disk_grid(pts, pts, r, dim=3)
    os.environ["VIENNARAY_TPU_NO_NATIVE"] = "1"
    try:
        native._LIB = None
        native._TRIED = False
        g_numpy = grid_accel.build_disk_grid(pts, pts, r, dim=3)
    finally:
        del os.environ["VIENNARAY_TPU_NO_NATIVE"]
        native._TRIED = False

    assert g_native.dims == g_numpy.dims
    np.testing.assert_allclose(g_native.origin, g_numpy.origin)
    # same membership per cell (order may differ)
    assert g_native.cells.shape[0] == g_numpy.cells.shape[0]
    for c in range(g_native.cells.shape[0]):
        a = set(g_native.cells[c][g_native.cells[c] >= 0].tolist())
        b = set(g_numpy.cells[c][g_numpy.cells[c] >= 0].tolist())
        assert a == b, c


@pytest.mark.skipif(native.load() is None, reason="native lib unavailable")
def test_native_neighborhood_speed_smoke():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(50_000, 3))
    import time

    t0 = time.perf_counter()
    nbrs, counts = native.build_neighborhood_native(pts, 0.3, 3)
    dt = time.perf_counter() - t0
    assert dt < 5.0  # native must handle 50k points quickly
    assert counts.sum() % 2 == 0  # symmetric pairs
