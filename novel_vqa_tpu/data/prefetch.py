"""Host->device prefetch.

Double-buffers ``jax.device_put`` of host batches so the transfer of batch
i+1 overlaps the device compute of batch i — the TPU-native replacement for
the reference's synchronous per-batch ``:cuda()`` copies
(002_train_vqa_arch1/002_train_baseline.lua:213-218).  For the steady-state
VQA training path the HBM-resident indexed step (train_step_indexed) makes
this unnecessary; it matters for streaming pipelines (feature extraction,
weak-paired images) whose working set exceeds HBM.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterable, Iterator, Optional


def prefetch_to_device(
    iterator: Iterable[Any], size: int = 2, sharding: Optional[Any] = None
) -> Iterator[Any]:
    import jax

    def put(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
            batch,
        )

    pool = ThreadPoolExecutor(max_workers=1)
    it = iter(iterator)
    queue = []
    try:
        for _ in range(size):
            try:
                queue.append(pool.submit(put, next(it)))
            except StopIteration:
                break
        while queue:
            out = queue.pop(0).result()
            try:
                queue.append(pool.submit(put, next(it)))
            except StopIteration:
                pass
            yield out
    finally:
        pool.shutdown(wait=False)
