"""Background-thread prefetch for host-side input pipelines.

The per-batch host work (artifact reads, C++ channel assembly,
np.stack collation) and the H2D dispatch serialize with device compute
when done inline — the round-4 sustained 416x800 run measured the
naive training loop at ~3x the pure device step for exactly this
reason. ``prefetch_iter`` runs the source iterator (plus an optional
``prepare`` transform — typically the jax.device_put, which is async
and therefore overlaps the transfer itself with device compute) on a
worker thread, keeping up to ``depth`` items ready ahead of the
consumer.

Semantics the trainer and the evaluation harness both rely on:
- items arrive in source order, exactly once;
- an exception on the worker re-raises on the CONSUMER thread at the
  point the failing item would have been consumed (a worker raise must
  never hang the consumer — learned the hard way in infer_stream,
  serving.py);
- the consumer may stop early (preemption, break): the producer is
  unblocked and the thread exits promptly rather than blocking forever
  on a full queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_END = object()


def prefetch_iter(
    src: Iterable[T],
    depth: int,
    prepare: Optional[Callable[[T], U]] = None,
) -> Iterator[U]:
    """Yield ``prepare(item)`` for each item of ``src``, computed up to
    ``depth`` items ahead on a worker thread. ``depth <= 0`` degrades
    to the inline path (no thread — multi-process training uses this:
    global-array assembly must stay on one thread in a deterministic
    order)."""
    if prepare is None:
        prepare = lambda x: x  # noqa: E731
    if depth <= 0:
        for item in src:
            yield prepare(item)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put_until_stop(out) -> bool:
        # Every producer-side put must be stop-checked: an untimed
        # q.put on a full queue would park this thread forever when the
        # consumer exits early, and a timed-out put that gives up would
        # drop the _END/error sentinel and hang the consumer in q.get()
        # while it waits out a long first compile.
        while not stop.is_set():
            try:
                q.put(out, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in src:
                if not put_until_stop((None, prepare(item))):
                    return
            put_until_stop((None, _END))
        except BaseException as e:  # re-raised on the consumer thread
            put_until_stop((e, None))

    t = threading.Thread(target=worker, daemon=True, name="prefetch_iter")
    t.start()
    try:
        while True:
            err, item = q.get()
            if err is not None:
                raise err
            if item is _END:
                return
            yield item
    finally:
        stop.set()
