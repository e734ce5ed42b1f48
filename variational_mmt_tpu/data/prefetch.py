"""Host→device double-buffered prefetch.

The reference does one synchronous ``.cuda()`` copy per batch inside the hot
loop (SURVEY.md §3.2). On TPU the equivalent is to overlap the host→HBM
transfer of batch t+1 with the device compute of batch t: a small thread
pre-assembles batches and ``jax.device_put``s them (optionally with a
``NamedSharding`` so each data shard lands directly on its device) while the
train step runs asynchronously (JAX dispatch is non-blocking).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax

from variational_mmt_tpu.data.dataset import Batch


def device_batch(batch: Batch, sharding: Optional[Any] = None) -> dict:
    """Move a host Batch to device as a dict-of-arrays pytree."""
    tree = {
        "src": batch.src,
        "tgt_in": batch.tgt_in,
        "tgt_out": batch.tgt_out,
        "example_mask": batch.example_mask,
    }
    if batch.img is not None:
        tree["img"] = batch.img
    if sharding is not None:
        return jax.device_put(tree, sharding)
    return jax.device_put(tree)


def prefetch(
    it: Iterator[Batch],
    size: int = 2,
    transform: Optional[Callable[[Batch], Any]] = None,
) -> Iterator[Any]:
    """Iterate `it` on a background thread, keeping `size` device batches in
    flight. `transform` defaults to :func:`device_batch`."""
    xform = transform or device_batch
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    closed = threading.Event()

    def put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator (otherwise the thread blocks forever on a full queue,
        # pinning device batches for the life of the process)
        while not closed.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker() -> None:
        try:
            for b in it:
                if not put(xform(b)):
                    return
        except Exception as e:  # surface worker errors on the main thread
            err.append(e)
        finally:
            put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer break/close: release the producer
        closed.set()
