"""End-to-end entry runtime: tiny observed train -> auto-test on SYNTH.

Covers the full vertical slice (SURVEY.md section 7.2 step 3): config ->
data -> model -> solver -> trainer loop -> eval protocol -> checkpoint
discovery -> test command, in-process.
"""

import json
from pathlib import Path

import numpy as np
import pytest


def make_experiment(tmp_path):
    import entry.baseline as eb
    cfg, run = eb.ex.assemble("train", {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "data.num_workers": "2", "te.epochs": "1",
        "tr.total_epochs": "1", "net.backbone": "vgg16",
        "g.model_dir": str(tmp_path),
    })
    return eb, cfg, run


def test_train_then_test_roundtrip(tmp_path):
    eb, cfg, run = make_experiment(tmp_path)
    result = eb.BaselineRuntime(cfg, run).train()
    # train auto-chains into test and returns its summary string
    assert result is not None and "mIoU" in result

    run_dir = tmp_path / cfg.tag / "1"
    assert (run_dir / "config.json").exists()
    assert (run_dir / "ckpt.msgpack").exists()
    assert (run_dir / "bestckpt.msgpack").exists()
    metrics = json.loads((run_dir / "metrics.json").read_text())
    for key in ("train_loss", "val_loss", "val_mIoU", "val_bIoU"):
        assert key in metrics and len(metrics[key]) == 1


def test_grads_flow_and_frozen_params_stay(tmp_path):
    """One real train step on PEMP stage-1 resnet50: trainable params
    move, frozen backbone BN params don't, batch stats DO update
    (frozen-BN semantics, reference backbones.py:56-62)."""
    import jax
    import flax.traverse_util as tu
    from pemp_tpu.config import Config
    from pemp_tpu.core import solver as solver_lib
    from pemp_tpu.core.trainer import TrainState
    from pemp_tpu.core.experiment import EntryRuntime
    from pemp_tpu.models import registry

    cfg = Config(split=0, shot=1, query=1)
    cfg.net = registry.net_config("pemp_stage1")
    cfg.net.backbone = "resnet50"
    cfg.data.dataset = "SYNTH"
    cfg.data.height = cfg.data.width = 33

    class RT(EntryRuntime):
        name = "pemp_stage1"

    from pemp_tpu.config.cli import Run
    rt = RT(cfg, Run(None, None))
    variables = rt.init_variables()
    tx, opt_state, lrp, _ = solver_lib.get(
        cfg.tr, variables["params"], rt.frozen_patterns, 10)
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt_state)

    from pemp_tpu.parallel.step import make_train_step
    step = make_train_step(rt.make_loss_fn(), tx)

    rng = np.random.RandomState(0)
    # one episode has an ALL-FOREGROUND support mask (bg prototype is the
    # zero vector) — gradients must stay finite (safe-norm semantics)
    fg = (rng.rand(2, 1, 33, 33, 1) > 0.5).astype(np.float32)
    fg[0] = 1.0
    batch = {
        "sup_rgb": rng.randn(2, 1, 33, 33, 3).astype(np.float32),
        "sup_mask": np.concatenate([fg, 1.0 - fg], -1),
        "qry_rgb": rng.randn(2, 1, 33, 33, 3).astype(np.float32),
        "qry_msk": rng.randint(0, 2, (2, 1, 33, 33)).astype(np.int32),
    }
    before_p = tu.flatten_dict(jax.device_get(state.params), sep="/")
    before_s = tu.flatten_dict(jax.device_get(state.batch_stats), sep="/")
    state, loss, _ = step(state, batch, 0.01, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    after_p = tu.flatten_dict(jax.device_get(state.params), sep="/")
    after_s = tu.flatten_dict(jax.device_get(state.batch_stats), sep="/")

    moved = changed_frozen = 0
    for k in before_p:
        assert np.isfinite(after_p[k]).all(), f"non-finite params at {k}"
        delta = float(np.abs(after_p[k] - before_p[k]).max())
        if "backbone/" in k and "bn" in k.lower():
            assert delta == 0.0, f"frozen param moved: {k}"
            changed_frozen += 1
        elif delta > 0:
            moved += 1
    assert changed_frozen > 50          # there are many frozen BN params
    assert moved > 10                   # trainable params updated
    assert float(np.abs(after_p["ctr"] - before_p["ctr"]).max()) > 0

    # frozen-BN running statistics still update in train mode
    stats_moved = sum(
        float(np.abs(after_s[k] - before_s[k]).max()) > 0 for k in before_s)
    assert stats_moved > 0


def test_fast_eval_matches_host_path(tmp_path):
    """The on-device batched eval (resize+argmax+counts on device) must
    produce identical metrics to the host-exact per-episode path."""
    eb, cfg, run = make_experiment(tmp_path)
    rt = eb.BaselineRuntime(cfg, run)
    rt.train()

    import entry.baseline as eb2
    results = []
    for fast in (True, False):
        cfg2, run2 = eb.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "6", "te.epochs": "1",
            "data.test_bs": "3" if fast else "1",
            "net.backbone": "vgg16", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        rt2 = eb.BaselineRuntime(cfg2, run2)
        rt2.supports_fast_eval = fast
        results.append(rt2.test())
    # identical mIoU/bIoU strings (loss formatting may differ in the
    # last digit from f16 wire + reduction order; compare metrics only)
    m_fast = results[0].split("mIoU")[1]
    m_slow = results[1].split("mIoU")[1]
    assert m_fast == m_slow, results


def test_canet_fast_eval_matches_host_path_and_history(tmp_path):
    """CaNet's fast eval (r4): the on-device metric path returns the
    feature-res logits for the history write-back, so metrics AND the
    store contents after a test run must match the host-exact path
    (which writes back via the eval-step wrapper)."""
    import entry.canet as ec
    cfg, run = ec.ex.assemble("train", {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "te.epochs": "1", "tr.total_epochs": "1",
        "net.freeze_backbone": "False", "g.model_dir": str(tmp_path),
    })
    ec.CaNetRuntime(cfg, run).train()

    results, stores = [], []
    for fast in (True, False):
        cfg2, run2 = ec.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "6", "te.epochs": "2",
            "data.test_bs": "3" if fast else "1",
            "net.freeze_backbone": "False", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        rt2 = ec.CaNetRuntime(cfg2, run2)
        rt2.supports_fast_eval = fast
        results.append(rt2.test())
        stores.append(dict(rt2.store._store))
    m_fast = results[0].split("mIoU")[1]
    m_slow = results[1].split("mIoU")[1]
    assert m_fast == m_slow, results
    # same write-back set, same softmaxes (two compiled programs of the
    # same eval-mode math; this env's default matmul precision is
    # bf16-level even on CPU, so low bits differ between programs)
    assert stores[0].keys() == stores[1].keys()
    for k in stores[0]:
        np.testing.assert_allclose(stores[0][k], stores[1][k],
                                   rtol=5e-4, atol=1e-4, err_msg=str(k))


def test_fast_eval_matches_host_path_multi_query(tmp_path):
    """Q=2 episodes: both eval paths must count EVERY query (regression
    for the fast path silently using only query 0)."""
    eb, cfg, run = make_experiment(tmp_path)
    rt = eb.BaselineRuntime(cfg, run)
    rt.train()

    results = []
    for fast in (True, False):
        cfg2, run2 = eb.ex.assemble("test", {
            "split": "0", "data.dataset": "SYNTH", "data.height": "33",
            "data.width": "33", "data.test_n": "4", "te.epochs": "1",
            "query": "2", "data.test_bs": "2" if fast else "1",
            "net.backbone": "vgg16", "exp_id": "1",
            "g.model_dir": str(tmp_path),
        }, observed=False)
        rt2 = eb.BaselineRuntime(cfg2, run2)
        rt2.supports_fast_eval = fast
        results.append(rt2.test())
    m_fast = results[0].split("mIoU")[1]
    m_slow = results[1].split("mIoU")[1]
    assert m_fast == m_slow, results
