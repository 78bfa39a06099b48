"""Device-batch prefetching: overlap host batch prep with device steps.

The reference overlaps via DataLoader worker processes + CUDA async
copies; here a single background thread runs the (jitted) host->device
prep for the NEXT batch while the current training step executes, keeping
the accelerator fed. JAX dispatch is async, so enqueueing from a second
thread is safe; depth > 2 rarely helps because the step itself pipelines.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Tuple

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable,
    prep: Callable,
    depth: int = 2,
) -> Iterator[Tuple]:
    """Yield ``prep(raw, index)`` results, computed ``depth`` ahead.

    ``prep`` takes (raw_batch, batch_index) so callers can fold the index
    into their rng. Exceptions in the worker propagate to the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))

    def worker():
        try:
            for i, raw in enumerate(batches):
                q.put(prep(raw, i))
        except BaseException as e:  # propagate into the consuming thread
            q.put((_SENTINEL, e))
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
            raise item[1]
        yield item
