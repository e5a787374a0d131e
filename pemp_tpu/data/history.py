"""CaNet history-mask store.

The reference keeps per-sample history predictions inside the dataset
object (``history_mask_list``, reference data_kits/pascal_voc.py:324)
and mutates it from the training loop — a fork-safety hazard with
DataLoader workers (SURVEY.md section 5.2: updates only reach workers
because they are re-forked each epoch). This rebuild uses an explicit
host-side store keyed by (class, sample name): deterministic under any
number of loader threads and trivially shardable per process.

Semantics preserved:
- initial history = zeros [h8, w8, 2],
- during training, a sample's history is reset to zeros with prob 0.3
  when loaded (reference :420-431),
- after every train/eval step the query's softmax prediction at 1/8
  resolution is written back (reference entry/canet.py:77-80, :137-140).

The reset draw is a deterministic hash of (seed, sample, per-sample load
count), NOT python's global ``random`` (which the reference uses): a
global-stream draw depends on every other ``random`` call's order, so
under multi-host its cross-rank agreement rests on perfect lockstep of
unrelated code — one rank-local draw anywhere and the 'replicated'
history batches silently diverge. The hash keeps the Bernoulli(0.3)
marginal per load (distributional parity — SURVEY §7.3 accepts that for
train-time randomness) while making the stream a pure function of what
was loaded, identical on every host and loader topology."""

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
        self._loads: Dict[Tuple[int, str], int] = {}
        self._lock = threading.Lock()

    def get(self, cls: int, name, train: bool) -> np.ndarray:
        key = (int(cls), name)
        with self._lock:
            hist = self._store.get(key)
            if train:
                n = self._loads.get(key, 0)
                self._loads[key] = n + 1
        if hist is None or (train and self._reset_draw(key, n)):
            return np.zeros((self.h8, self.w8, 2), np.float32)
        return hist

    def _reset_draw(self, key: Tuple[int, str], n_load: int) -> bool:
        h = zlib.crc32(f"{self.seed}/{key[0]}/{key[1]}/{n_load}".encode())
        return h / 2 ** 32 < 0.3

    def put(self, cls: int, name, softmax: np.ndarray) -> None:
        with self._lock:
            self._store[(int(cls), name)] = np.asarray(softmax, np.float32)

    def clear(self):
        with self._lock:
            self._store.clear()
            self._loads.clear()


class CaNetDataAdapter:
    """Wraps an episodic dataset: adds the query history mask to every
    episode and exposes the names needed for write-back."""

    def __init__(self, dataset, store: HistoryStore, train: bool):
        self.dataset = dataset
        self.store = store
        self.train = train
        # force names through so episodes are keyable
        self.dataset.ret_name = True

    def __getattr__(self, item):
        return getattr(self.dataset, item)

    def __len__(self):
        return len(self.dataset)

    def get_episode(self, idx: int):
        ep = self.dataset.get_episode(idx)
        hist = [self.store.get(ep["cls"], n, self.train)
                for n in ep["qry_names"]]
        ep["history"] = np.stack(hist)     # [Q, h8, w8, 2]
        return ep

    def update(self, batch, softmax: np.ndarray) -> None:
        """softmax: [B, Q, h8, w8, 2] feature-res predictions. EVERY
        query's prediction is written back — episodes with query > 1
        would otherwise leave queries >= 1 on the zeros default
        forever."""
        for i in range(softmax.shape[0]):
            for j, name in enumerate(batch["qry_names"][i]):
                self.store.put(batch["cls"][i], name, softmax[i, j])
