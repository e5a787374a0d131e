"""CaNet history-mask store.

The reference keeps per-sample history predictions inside the dataset
object (``history_mask_list``, reference data_kits/pascal_voc.py:324)
and mutates it from the training loop — a fork-safety hazard with
DataLoader workers (SURVEY.md section 5.2: updates only reach workers
because they are re-forked each epoch). This rebuild uses an explicit
host-side store keyed by (class, sample name) with two deterministic
semantics the reference gets implicitly from forked workers:

1. **Epoch-snapshot reads.** Reference workers hold a fork of the
   dataset taken when the epoch's iterator is created; the training
   loop's write-backs only become visible when the NEXT epoch (or eval
   round) re-forks. Reads here therefore come from a snapshot taken at
   ``next_epoch()`` (called when tasks are resampled) while writes go
   to the live store — so what an episode sees never depends on loader
   threading, prefetch depth, or how far the consumer has stepped.

2. **Stream-pure reset draws.** During training a sample's history is
   reset to zeros with prob 0.3 when loaded (reference :420-431). The
   reference draws from python's global ``random`` — a stream that
   depends on every other random call's order. Here the draw is a
   deterministic hash of (seed, train epoch, episode index, sample): a
   pure function of the globally-seeded task stream, identical on every
   host, loader topology, and thread schedule, with the Bernoulli(0.3)
   marginal per load preserved (SURVEY §7.3 accepts distributional
   parity for train-time randomness). The epoch number in the hash is
   the ADAPTER's resample count, not the shared store's: the store is
   resampled by train epochs AND eval rounds, so a store-global counter
   would make the train draw stream depend on how many eval rounds ran
   — and a resumed run (whose catch-up replays exactly ``start_epoch``
   train resamples, core/trainer.py) would draw a different reset
   pattern than the uninterrupted run.

Initial history = zeros [h8, w8, 2]; after every train/eval step the
query's softmax prediction at 1/8 resolution is written back
(reference entry/canet.py:77-80, :137-140).
"""

from __future__ import annotations

import threading
import zlib
from typing import Dict, Tuple

import numpy as np


class HistoryStore:
    def __init__(self, h8: int, w8: int, seed: int = 1234):
        self.h8 = h8
        self.w8 = w8
        self.seed = int(seed)
        self._store: Dict[Tuple[int, str], np.ndarray] = {}
        self._snapshot: Dict[Tuple[int, str], np.ndarray] = {}
        self._lock = threading.Lock()

    def next_epoch(self) -> None:
        """Start a new epoch / eval round: write-backs made so far
        become visible to reads (the reference's worker re-fork)."""
        with self._lock:
            self._snapshot = dict(self._store)

    def get(self, cls: int, name, train: bool, idx: int = 0,
            epoch: int = 0) -> np.ndarray:
        """History for one query load; ``(epoch, idx)`` identify the load
        event for the reset draw (the caller's TRAIN-epoch counter and
        the episode's index in that epoch's task list) — only consulted
        when ``train``."""
        key = (int(cls), name)
        with self._lock:
            hist = self._snapshot.get(key)
        if hist is None or (train and self._reset_draw(key, epoch, idx)):
            return np.zeros((self.h8, self.w8, 2), np.float32)
        return hist

    def _reset_draw(self, key: Tuple[int, str], epoch: int,
                    idx: int) -> bool:
        h = zlib.crc32(
            f"{self.seed}/{epoch}/{idx}/{key[0]}/{key[1]}".encode())
        return h / 2 ** 32 < 0.3

    def put(self, cls: int, name, softmax: np.ndarray) -> None:
        with self._lock:
            self._store[(int(cls), name)] = np.asarray(softmax, np.float32)

    def clear(self):
        with self._lock:
            self._store.clear()
            self._snapshot.clear()


class CaNetDataAdapter:
    """Wraps an episodic dataset: adds the query history mask to every
    episode and advances the store's epoch whenever the task stream is
    resampled (train epochs and eval rounds both resample)."""

    def __init__(self, dataset, store: HistoryStore, train: bool):
        self.dataset = dataset
        self.store = store
        self.train = train
        self.epoch = 0      # THIS adapter's resamples only (see module
        # docstring: the shared store is also resampled by eval rounds)
        # force names through so episodes are keyable
        self.dataset.ret_name = True

    def __getattr__(self, item):
        return getattr(self.dataset, item)

    def __len__(self):
        return len(self.dataset)

    def sample_tasks(self):
        self.epoch += 1
        self.store.next_epoch()
        return self.dataset.sample_tasks()

    def get_episode(self, idx: int):
        ep = self.dataset.get_episode(idx)
        hist = [self.store.get(ep["cls"], n, self.train, idx, self.epoch)
                for n in ep["qry_names"]]
        ep["history"] = np.stack(hist)     # [Q, h8, w8, 2]
        return ep
