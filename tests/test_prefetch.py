"""utils/prefetch.prefetch_iter: ordering, error propagation, early
exit. Both the trainer's microbatch pipeline and the evaluation
harness ride this helper, so its contract is pinned here directly."""

import threading
import time

import pytest

from camradepth_tpu.utils.prefetch import prefetch_iter


def test_order_and_completeness():
    out = list(prefetch_iter(range(100), depth=4, prepare=lambda x: x * 2))
    assert out == [x * 2 for x in range(100)]


def test_inline_path_no_thread():
    n0 = threading.active_count()
    out = list(prefetch_iter(range(10), depth=0))
    assert out == list(range(10))
    assert threading.active_count() == n0


def test_prepare_error_reraises_on_consumer():
    def prepare(x):
        if x == 3:
            raise ValueError("boom at 3")
        return x

    it = prefetch_iter(range(10), depth=2, prepare=prepare)
    got = []
    with pytest.raises(ValueError, match="boom at 3"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2]


def test_source_error_reraises():
    def src():
        yield 1
        raise RuntimeError("loader died")

    with pytest.raises(RuntimeError, match="loader died"):
        list(prefetch_iter(src(), depth=2))


def test_early_consumer_exit_unblocks_producer():
    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iter(src(), depth=2)
    for x in it:
        if x == 5:
            break
    it.close()  # generator finalizer sets the stop event
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if all(not t.name.startswith("prefetch_iter")
               for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert all(not t.name.startswith("prefetch_iter")
               for t in threading.enumerate()), "producer thread leaked"
    # the producer ran ahead by at most depth + in-flight slack, not
    # through the whole source
    assert len(produced) < 20


def test_error_survives_full_queue_and_slow_consumer():
    """A worker raise while the queue is full must still reach the
    consumer after it drains the queued items — the error put must
    retry like any other put, not give up after a timeout (regression:
    a 1 s put timeout dropped the error while the consumer sat in a
    long first compile, hanging it in q.get() forever)."""

    def src():
        yield 0
        yield 1
        raise RuntimeError("late boom")

    it = prefetch_iter(src(), depth=1)
    time.sleep(1.5)  # queue full; the old error put timed out by now
    got, err = [], []

    def consume():
        try:
            for x in it:
                got.append(x)
        except RuntimeError as e:
            err.append(e)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(10.0)
    assert not t.is_alive(), "consumer hung: worker error was dropped"
    assert got == [0, 1]
    assert err and "late boom" in str(err[0])


def test_end_sentinel_put_respects_stop():
    """Worker parked on the END-sentinel put (source exhausted, queue
    full) must exit when the consumer stops early — the old untimed
    q.put leaked the thread and its device-resident queue items."""
    it = prefetch_iter(iter([0, 1]), depth=1)
    assert next(it) == 0
    time.sleep(0.3)  # worker: item 1 queued, now parked on the END put
    it.close()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if all(not t.name.startswith("prefetch_iter")
               for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert all(not t.name.startswith("prefetch_iter")
               for t in threading.enumerate()), (
        "producer thread leaked on the END-sentinel put")


def test_overlap_actually_happens():
    """With depth>=1 the producer works ahead while the consumer is
    busy: total wall-clock for N items with producer cost p and
    consumer cost c approaches max(p, c)*N rather than (p+c)*N."""
    N, p, c = 10, 0.02, 0.02

    def prepare(x):
        time.sleep(p)
        return x

    t0 = time.time()
    for _ in prefetch_iter(range(N), depth=2, prepare=prepare):
        time.sleep(c)
    overlapped = time.time() - t0
    assert overlapped < (p + c) * N * 0.85, (
        f"no overlap: {overlapped:.3f}s vs serial {(p + c) * N:.3f}s"
    )
