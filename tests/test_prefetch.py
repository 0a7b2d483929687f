"""Background prefetcher tests."""
import time

import pytest

from dynamorph_tpu.io.prefetch import Prefetcher


def test_prefetcher_yields_in_order():
    out = list(Prefetcher([3, 1, 2], lambda x: x * 10))
    assert out == [(3, 30), (1, 10), (2, 20)]


def test_prefetcher_overlaps_loading():
    """While the consumer processes item i, item i+1 loads in background."""
    load_times = {}

    def loader(x):
        load_times[x] = time.perf_counter()
        time.sleep(0.05)
        return x

    t0 = time.perf_counter()
    consumed = []
    for item, val in Prefetcher([0, 1, 2, 3], loader):
        time.sleep(0.05)  # consumer work
        consumed.append(item)
    total = time.perf_counter() - t0
    assert consumed == [0, 1, 2, 3]
    # serial would be >= 8*0.05 = 0.4s; overlapped ~0.25s
    assert total < 0.38, total


def test_prefetcher_propagates_exceptions():
    def loader(x):
        if x == 1:
            raise ValueError("boom")
        return x

    it = iter(Prefetcher([0, 1], loader))
    assert next(it) == (0, 0)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_bounded_runahead():
    """Item i+depth must not start loading before item i is yielded — an
    unbounded prefetch would stage a whole epoch of device batches in HBM."""
    import threading

    started = []
    release = threading.Event()

    def loader(x):
        started.append(x)
        if x == 0:
            release.wait(timeout=5)
        return x

    pf = Prefetcher(list(range(6)), loader, depth=2)
    it = iter(pf)
    # force the pipeline to fill without consuming anything: give the pool a
    # moment to start whatever it is allowed to start
    t = threading.Thread(target=lambda: started.append("probe"))
    t.start(); t.join()
    time.sleep(0.2)
    # with depth=2 only items 0 and 1 may have started (0 blocks a worker)
    assert set(x for x in started if x != "probe") <= {0, 1, 2}, started
    assert 4 not in started and 5 not in started
    release.set()
    out = [item for item, _ in it]
    assert out == list(range(6))
