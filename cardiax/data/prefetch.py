"""Prefetching batch pipeline: overlap host-side batch assembly + H2D copies
with device compute.

The reference's DataLoaders are synchronous single-worker (num_workers<=1,
SURVEY.md 0.1); on TPU the host feeds a much faster device, so the loader
prefetches ahead on a background thread and ships batches to the mesh with
their shardings while the previous step computes (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator

from cardiax.parallel.mesh import shard_batch

_SENTINEL = object()


class PrefetchBatcher:
    """Wraps any batch iterable; yields device-placed batches ``depth`` ahead.

    Array leaves arrive as sharded jax.Arrays (batch axis over the mesh);
    non-array fields pass through host-side. Exceptions on the worker thread
    re-raise in the consumer.
    """

    def __init__(self, loader, mesh, depth: int = 2):
        self.loader = loader
        self.mesh = mesh
        self.depth = max(1, int(depth))

    def __len__(self) -> int:
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        """Forward the engine's epoch pin to the wrapped loader (epoch-indexed
        shuffle; no-op for loaders without one)."""
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for batch in self.loader:
                    q.put(shard_batch(batch, self.mesh))
            except Exception as e:  # noqa: BLE001 — surfaced to consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
