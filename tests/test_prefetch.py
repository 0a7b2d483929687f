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
    """While the consumer is blocked on item 0, items beyond the depth
    window must not even be SUBMITTED — an unbounded prefetch would stage a
    whole epoch of device batches in HBM."""
    import threading

    started = []
    release = threading.Event()

    def loader(x):
        started.append(x)
        if x == 0:
            release.wait(timeout=5)
        return x

    pf = Prefetcher(list(range(6)), loader, depth=2)
    out = []

    def consume():
        out.extend(item for item, _ in pf)

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(0.3)
    # the consumer is blocked yielding item 0 (loader stalls on `release`),
    # so at most items 0..depth=2 may have been submitted/started; an
    # unbounded prefetcher would have started 3, 4, 5 by now
    assert set(started) <= {0, 1, 2}, started
    assert 4 not in started and 5 not in started
    release.set()
    t.join(timeout=5)
    assert out == list(range(6))


def test_async_writer_writes_all_and_bounds_queue(tmp_path):
    import threading
    import time

    from dynamorph_tpu.io.prefetch import AsyncWriter

    written = []
    gate = threading.Event()

    def slow_write(i):
        gate.wait(5)
        written.append(i)

    w = AsyncWriter(depth=2)
    w.submit(slow_write, 0)
    w.submit(slow_write, 1)
    # third submit must BLOCK until a slot frees (bounded memory)
    t0 = time.perf_counter()
    blocker = threading.Thread(target=lambda: w.submit(slow_write, 2))
    blocker.start()
    time.sleep(0.05)
    assert blocker.is_alive()  # still blocked on the full queue
    gate.set()
    blocker.join(5)
    w.close()
    assert written == [0, 1, 2]  # single worker preserves order


def test_async_writer_close_reraises(tmp_path):
    import pytest

    from dynamorph_tpu.io.prefetch import AsyncWriter

    def boom():
        raise RuntimeError("disk full")

    w = AsyncWriter()
    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w.close()
