"""Few-shot segmentation metrics.

``FewShotMetric`` is behaviorally identical to the reference
(core/metrics.py:4-35): per-class TP/FP/FN accumulated over episodes with
255-labels ignored, class-averaged mIoU over the split's val labels, and
binary IoU (bg row vs. the sum of all fg rows). The host accumulator takes
either numpy arrays or the device-side [2, 3] count tensors produced by
``tp_fp_fn`` inside a jitted eval step (so per-pixel comparisons never
leave the device).

``Accumulator`` mirrors reference core/metrics.py:38-72.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def tp_fp_fn(pred: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Device-side per-episode counts for classes [bg, fg].

    pred / ref: integer maps of identical shape; ref==255 is ignored.
    Returns [2, 3] int32: rows (bg, fg) x cols (tp, fp, fn).
    """
    valid = ref != 255
    rows = []
    for j in (0, 1):
        p = jnp.logical_and(pred == j, valid)
        r = jnp.logical_and(ref == j, valid)
        tp = jnp.sum(jnp.logical_and(p, r))
        fp = jnp.sum(jnp.logical_and(p, jnp.logical_not(r)))
        fn = jnp.sum(jnp.logical_and(jnp.logical_not(p), r))
        rows.append(jnp.stack([tp, fp, fn]))
    return jnp.stack(rows).astype(jnp.int32)


class FewShotMetric:
    def __init__(self, classes: int):
        self.classes = classes
        self.stat = np.zeros((classes + 1, 3), np.int64)   # +1 for bg

    def update(self, pred, ref, cls):
        """pred/ref: [B, H, W] integer maps; cls: [B] episode fg class ids."""
        pred = np.asarray(pred, np.uint8)
        ref = np.asarray(ref, np.uint8)
        for i, ci in enumerate(np.atleast_1d(np.asarray(cls))):
            p, r = pred[i], ref[i]
            valid = r != 255
            for j, c in enumerate([0, int(ci)]):
                pj = np.logical_and(p == j, valid)
                rj = np.logical_and(r == j, valid)
                self.stat[c, 0] += np.logical_and(pj, rj).sum()
                self.stat[c, 1] += np.logical_and(pj, ~rj).sum()
                self.stat[c, 2] += np.logical_and(~pj, rj).sum()

    def update_counts(self, counts, cls):
        """Accumulate device-computed [B, 2, 3] counts from ``tp_fp_fn``."""
        counts = np.asarray(counts, np.int64)
        for i, ci in enumerate(np.atleast_1d(np.asarray(cls))):
            self.stat[0] += counts[i, 0]
            self.stat[int(ci)] += counts[i, 1]

    def mIoU(self, labels: Sequence[int], binary: bool = False):
        if binary:
            stat = np.stack([self.stat[0], self.stat[1:].sum(axis=0)])  # [2,3]
        else:
            stat = self.stat[np.asarray(labels)]                        # [N,3]
        tp, fp, fn = stat.T.astype(np.float64)
        iou = tp / np.maximum(tp + fp + fn, 1e-12)
        return iou, iou.mean()


class Accumulator:
    def __init__(self, **kwargs):
        self.values = kwargs
        self.counter = {k: 0 for k in kwargs}

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if isinstance(self.values[k], list):
                self.values[k].append(v)
            else:
                self.values[k] = self.values[k] + v
            self.counter[k] += 1

    def mean(self, key, axis=None):
        if isinstance(key, str):
            if isinstance(self.values[key], list):
                return np.array(self.values[key]).mean(axis)
            return self.values[key] / max(self.counter[key], 1)
        return [self.mean(k, axis) for k in key]

    def std(self, key, axis=None):
        if isinstance(key, str):
            return np.array(self.values[key]).std(axis)
        return [self.std(k, axis) for k in key]
