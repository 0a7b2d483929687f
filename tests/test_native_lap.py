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


def test_lap_native_path_actually_solves(caplog, rng):
    """The scipy fallback on rc != 0 must not mask native defects: across a
    tie-heavy + degenerate + structured sweep, the native solver itself has
    to return rc == 0 (no 'falling back' warnings) and stay optimal. A
    prior implementation bug made rc=2 fallbacks on most inputs and hung on
    tie-heavy integer matrices."""
    import logging

    from scipy.optimize import linear_sum_assignment

    with caplog.at_level(logging.WARNING, "dynamorph_tpu.native.lap"):
        for trial in range(60):
            trng = np.random.RandomState(trial)
            n = trng.randint(1, 50)
            c = [trng.randint(0, 4, (n, n)).astype(float),
                 np.zeros((n, n)),
                 trng.rand(n, n)][trial % 3]
            r, col = lap_solve(c)
            assert sorted(col.tolist()) == list(range(n))
            rs, cs = linear_sum_assignment(c)
            np.testing.assert_allclose(c[r, col].sum(), c[rs, cs].sum(),
                                       rtol=1e-10, atol=1e-12)
    assert not [m for m in caplog.messages if "falling back" in m]


def test_lap_nonfinite_costs_fall_back_cleanly():
    """inf/NaN costs must return rc=3 (clean scipy fallback), never hang or
    corrupt memory."""
    from scipy.optimize import linear_sum_assignment  # noqa: F401

    c = np.zeros((6, 6))
    c[1, 2] = np.nan
    with pytest.raises(ValueError):   # scipy's own error, via the fallback
        lap_solve(c)


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
