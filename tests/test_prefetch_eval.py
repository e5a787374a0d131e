"""Eval-loader device prefetch: ``EntryRuntime._maybe_prefetch_eval``
wraps the test/val loaders in a ``DevicePrefetcher`` (the TPU-native
analog of the reference's pinned-memory DataLoader, reference
core/base_trainer.py eval loop pulls batches synchronously).

Covers:
- ``Evaluator._fixed_size`` recognises device-resident batches (the
  prefetcher device_puts ``qry_msk``; a jax.Array must still select the
  fully-on-device fast path).
- Prefetched eval metrics are identical to the serial-loader eval.
- The fast path really is taken end-to-end under prefetch (the host
  fallback is rigged to fail).
"""

import numpy as np
import jax.numpy as jnp


def test_fixed_size_accepts_device_and_host_batches():
    from pemp_tpu.core.trainer import Evaluator

    rgb = np.zeros((2, 1, 9, 9, 3), np.float32)
    msk_np = np.zeros((2, 1, 9, 9), np.uint8)
    assert Evaluator._fixed_size({"qry_rgb": rgb, "qry_msk": msk_np})
    assert Evaluator._fixed_size(
        {"qry_rgb": jnp.asarray(rgb), "qry_msk": jnp.asarray(msk_np)})
    # variable-size GT arrives as a list of per-episode arrays
    var = [np.zeros((1, 5, 7), np.uint8), np.zeros((1, 9, 4), np.uint8)]
    assert not Evaluator._fixed_size({"qry_rgb": rgb, "qry_msk": var})
    # size mismatch -> host/bucket path
    small = np.zeros((2, 1, 5, 5), np.uint8)
    assert not Evaluator._fixed_size({"qry_rgb": rgb, "qry_msk": small})


def test_prefetched_eval_matches_serial_and_uses_fast_path(
        tmp_path, monkeypatch):
    import entry.baseline as eb
    from pemp_tpu.core import experiment, trainer

    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "te.epochs": "1", "tr.total_epochs": "1",
        "net.backbone": "vgg16", "g.model_dir": str(tmp_path),
    })
    eb.BaselineRuntime(cfg, run).train()

    def run_test(prefetch: bool):
        cfg2, run2 = eb.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "6", "data.test_bs": "3",
            "te.epochs": "2", "net.backbone": "vgg16", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        rt = eb.BaselineRuntime(cfg2, run2)
        if not prefetch:
            monkeypatch.setattr(
                experiment.EntryRuntime, "_maybe_prefetch_eval",
                lambda self, loader: loader)
        result = rt.test()
        monkeypatch.undo()
        return result

    serial = run_test(prefetch=False)

    # fixed-size GT + prefetch: the host tail must never run
    def boom(*a, **k):
        raise AssertionError("host-exact fallback taken under prefetch "
                             "with fixed-size device batches")
    monkeypatch.setattr(trainer.Evaluator, "_episode_metrics", boom)
    prefetched = run_test(prefetch=True)

    assert prefetched == serial
