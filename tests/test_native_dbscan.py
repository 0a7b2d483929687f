"""Native grid-DBSCAN: exact label parity vs sklearn, and speed."""
import time

import numpy as np
import pytest

from dynamorph_tpu.native.dbscan import grid_dbscan, native_dbscan_available

pytestmark = pytest.mark.skipif(
    not native_dbscan_available(), reason="g++ toolchain unavailable")


def _fg_positions(rng, size=512, n_cells=5, r=16, noise=200):
    yy, xx = np.mgrid[:size, :size]
    fg = np.zeros((size, size), bool)
    for cy, cx in rng.randint(40, size - 40, size=(n_cells, 2)):
        fg |= (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
    # scattered noise pixels
    ys = rng.randint(0, size, noise)
    xs = rng.randint(0, size, noise)
    fg[ys, xs] = True
    return np.array(list(zip(*np.where(fg))))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grid_dbscan_matches_sklearn_exactly(seed):
    from sklearn.cluster import DBSCAN

    rng = np.random.RandomState(seed)
    positions = _fg_positions(rng)
    ours = grid_dbscan(positions, eps=10, min_samples=250)
    ref = DBSCAN(eps=10, min_samples=250).fit(positions).labels_
    np.testing.assert_array_equal(ours, ref)


def test_grid_dbscan_small_eps_exact(rng):
    from sklearn.cluster import DBSCAN

    positions = _fg_positions(rng, size=256, n_cells=8, r=8, noise=500)
    for eps, ms in [(2, 5), (5, 30), (10, 100)]:
        ours = grid_dbscan(positions, eps=eps, min_samples=ms)
        ref = DBSCAN(eps=eps, min_samples=ms).fit(positions).labels_
        np.testing.assert_array_equal(ours, ref, err_msg=f"eps={eps}")


def test_grid_dbscan_duplicate_points_match_sklearn(rng):
    """Duplicate points violate the occupancy grid's one-index-per-pixel
    precondition; the wrapper must detect them and route to sklearn so the
    two backends can never silently diverge."""
    from sklearn.cluster import DBSCAN

    pts = _fg_positions(rng, size=128, n_cells=2, r=10, noise=30)
    pts = np.concatenate([pts, pts[:17]], 0)          # duplicates
    got = grid_dbscan(pts, eps=3.0, min_samples=5)
    ref = DBSCAN(eps=3.0, min_samples=5).fit(pts).labels_
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("threads", [2, 4, 8])
def test_grid_dbscan_threaded_labels_identical(rng, threads):
    """The multithreaded core test (grid_dbscan_mt) must produce labels
    bit-identical to the serial solver for any thread count — the core test
    is per-point independent and the component DFS stays serial."""
    positions = _fg_positions(rng, size=1024, n_cells=20, r=24, noise=3000)
    assert len(positions) > 8192  # above the serial small-n cutoff
    serial = grid_dbscan(positions, eps=10, min_samples=250, threads=1)
    multi = grid_dbscan(positions, eps=10, min_samples=250, threads=threads)
    np.testing.assert_array_equal(serial, multi)


def test_grid_dbscan_speed(rng):
    from sklearn.cluster import DBSCAN

    positions = _fg_positions(rng, size=2048, n_cells=40, r=30, noise=2000)
    assert len(positions) > 100_000

    t0 = time.perf_counter()
    ours = grid_dbscan(positions, eps=10, min_samples=250)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = DBSCAN(eps=10, min_samples=250).fit(positions).labels_
    t_sklearn = time.perf_counter() - t0
    np.testing.assert_array_equal(ours, ref)
    print(f"native {t_native:.2f}s vs sklearn {t_sklearn:.2f}s "
          f"({t_sklearn / t_native:.1f}x) on {len(positions)} px")
    assert t_native < t_sklearn  # must actually be faster at frame scale
