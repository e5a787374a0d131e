"""FewShotMetric / Accumulator behavior vs a torch-free reference mirror
(reference core/metrics.py:4-72) + device counts equivalence."""

import numpy as np

import jax.numpy as jnp

from pemp_tpu.core.metrics import Accumulator, FewShotMetric, tp_fp_fn


def test_miou_and_biou_known_values():
    m = FewShotMetric(classes=20)
    pred = np.array([[[0, 1], [1, 1]]], np.uint8)       # [1, 2, 2]
    ref = np.array([[[0, 1], [0, 1]]], np.uint8)
    m.update(pred, ref, [7])
    # fg (class 7): tp=2, fp=1, fn=0 -> IoU 2/3; bg: tp=1, fp=0, fn=1 -> 1/2
    iou, mean = m.mIoU([7])
    np.testing.assert_allclose(iou, [2 / 3])
    biou, bmean = m.mIoU([7], binary=True)
    np.testing.assert_allclose(biou, [1 / 2, 2 / 3])
    np.testing.assert_allclose(bmean, (1 / 2 + 2 / 3) / 2)


def test_ignore_255():
    m = FewShotMetric(classes=5)
    pred = np.array([[[1, 1]]], np.uint8)
    ref = np.array([[[255, 1]]], np.uint8)
    m.update(pred, ref, [3])
    iou, _ = m.mIoU([3])
    np.testing.assert_allclose(iou, [1.0])   # ignored pixel excluded


def test_device_counts_match_host_update():
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 2, (3, 17, 19)).astype(np.int32)
    ref = rng.randint(0, 2, (3, 17, 19)).astype(np.int32)
    ref[0, 0, :5] = 255
    cls = [4, 9, 4]

    host = FewShotMetric(20)
    host.update(pred, ref, cls)

    dev = FewShotMetric(20)
    counts = np.stack([np.asarray(tp_fp_fn(jnp.asarray(pred[i]),
                                           jnp.asarray(ref[i])))
                       for i in range(3)])
    dev.update_counts(counts, cls)
    np.testing.assert_array_equal(host.stat, dev.stat)


def test_accumulator_mean_std():
    a = Accumulator(loss=[], count=0)
    a.update(loss=1.0, count=2)
    a.update(loss=3.0, count=4)
    assert a.mean("loss") == 2.0
    assert a.mean("count") == 3.0
    np.testing.assert_allclose(a.std("loss"), 1.0)
    assert a.mean(["loss", "count"]) == [2.0, 3.0]


def test_accumulator_axis_mean():
    a = Accumulator(miou=[])
    a.update(miou=np.array([0.2, 0.4]))
    a.update(miou=np.array([0.4, 0.8]))
    np.testing.assert_allclose(a.mean("miou", axis=0), [0.3, 0.6])
