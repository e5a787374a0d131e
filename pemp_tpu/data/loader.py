"""Host-side episodic batch loader with background prefetch.

Replaces the reference's forked ``torch.utils.data.DataLoader`` workers
(reference data_kits/pascal_voc.py:507-520) with a thread-pool decode +
bounded prefetch queue on the TPU-VM host. Batches are plain numpy dicts;
the step functions move them to device (jit arguments), letting transfers
overlap with compute via JAX's async dispatch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _collate(episodes) -> Dict:
    batch = {}
    for key in episodes[0]:
        vals = [ep[key] for ep in episodes]
        if key in ("sup_names", "qry_names"):
            batch[key] = vals
        elif key == "cls":
            batch[key] = np.asarray(vals, np.int32)
        else:
            try:
                batch[key] = np.stack(vals)
            except ValueError:
                # variable-size (test-time query GT at original resolution)
                batch[key] = vals
    return batch


class EpisodeLoader:
    """Iterates batches over the dataset's pre-sampled tasks.

    Each ``__iter__`` walks the current ``dataset.sampler.tasks`` in order
    (the reference shuffles by sampling tasks randomly, so the task list
    itself is already shuffled — DataLoader order adds nothing).
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 prefetch: int = 2, drop_last: bool = False,
                 shard_by_process: bool = False):
        """``shard_by_process=True`` gives each host process an
        equal-length rank-STRIDED shard of the globally pre-sampled
        episode list (wrap-around padded — see
        ``parallel.mesh.process_episode_indices``; the seeded sampler
        stream is identical on every process, so the global order is
        reproducible)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.shard_by_process = shard_by_process

    def _indices(self):
        n = len(self.dataset)
        if not self.shard_by_process:
            return list(range(n))
        # EQUAL-length rank shards (wrap-around padded, DistributedSampler
        # semantics): the sharded train step's collectives are synchronous
        # across the world, so every process must yield the same number of
        # batches or the pod deadlocks on the uneven tail rank.
        from pemp_tpu.parallel.mesh import process_episode_indices
        return process_episode_indices(n)

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _batches(self):
        idx = self._indices()
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in self._batches():
                        if stop.is_set():
                            return
                        eps = list(pool.map(self.dataset.get_episode, chunk))
                        if not put(_collate(eps)):
                            return
            except BaseException as e:  # surface worker errors to consumer
                put(e)
                return
            put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
