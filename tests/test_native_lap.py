"""Native JV LAP solver: optimality parity vs scipy Hungarian + speed."""
import numpy as np
import pytest

from dynamorph_tpu.native.lap import lap_solve, native_lap_available

pytestmark = pytest.mark.skipif(
    not native_lap_available(), reason="g++ toolchain unavailable")


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64, 200])
def test_lap_optimal_cost_matches_scipy(rng, n):
    from scipy.optimize import linear_sum_assignment

    cost = rng.rand(n, n)
    r, c = lap_solve(cost)
    # valid permutation
    assert sorted(c.tolist()) == list(range(n))
    rs, cs = linear_sum_assignment(cost)
    np.testing.assert_allclose(cost[r, c].sum(), cost[rs, cs].sum(),
                               rtol=1e-12)


def test_lap_structured_costs(rng):
    """Tracking-like cost matrices: large no-match plateaus + small blocks."""
    from scipy.optimize import linear_sum_assignment

    for trial in range(20):
        n1, n2 = rng.randint(1, 20), rng.randint(1, 20)
        n = n1 + n2
        big = 1e5
        cost = np.full((n, n), big)
        cost[:n1, :n2] = rng.rand(n1, n2) * 100
        for i in range(n1):
            cost[i, i + n2] = 105.0
        for j in range(n2):
            cost[n1 + j, j] = 105.0
        cost[n1:, n2:] = cost[:n1, :n2].T
        r, c = lap_solve(cost)
        rs, cs = linear_sum_assignment(cost)
        np.testing.assert_allclose(cost[r, c].sum(), cost[rs, cs].sum(),
                                   rtol=1e-10)


def test_lap_faster_than_scipy_large(rng):
    import time

    from scipy.optimize import linear_sum_assignment

    cost = rng.rand(600, 600)
    t0 = time.perf_counter()
    lap_solve(cost)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    linear_sum_assignment(cost)
    t_scipy = time.perf_counter() - t0
    # informational, not a hard gate (CI noise) — but it should not be
    # catastrophically slower
    assert t_native < t_scipy * 5, (t_native, t_scipy)
