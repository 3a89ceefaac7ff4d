"""Host->device prefetch: background thread producing sharded device
arrays so the TPU never waits on input (replaces torch DataLoader
pin_memory/prefetch_factor; SURVEY.md §7 step 6)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import jax.numpy as jnp


def device_prefetch(iterator: Iterator, sharding=None, size: int = 2,
                    cast_bf16: bool = True, put_fn=None):
    """Wrap a host batch iterator; yields device-resident (sharded) batches
    with ``size`` batches in flight. ``put_fn`` overrides the per-batch
    transfer (e.g. per-leaf shardings)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)

        def to_dev(x):
            arr = jnp.asarray(x)
            if cast_bf16 and jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(jnp.bfloat16)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        return jax.tree.map(to_dev, batch)

    sentinel = object()

    def worker():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(put(batch))
            q.put(sentinel)  # normal exhaustion
        except Exception as e:  # surface errors to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
