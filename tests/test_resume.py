"""Mid-run resume: LR-schedule position, best-mIoU tracking, and the
run-dir reuse that makes `train with resume=True exp_id=N` find the
checkpoint at all (the reference cannot resume — SURVEY.md section 5.4,
so these semantics are ours to pin down)."""

import json
from pathlib import Path

import numpy as np
import pytest

from flax import serialization

from pemp_tpu.core.solver import LRPolicy


class _TrCfg:
    lr = 0.1
    lr_end = 0.001
    lrp = "poly"
    power = 0.9
    lr_rate = 0.1
    lr_step = 2
    lr_boundaries = (2, 4)
    lr_min_delta = 0.0
    lr_patience = 1
    cool_down = 0


def test_poly_lr_clamps_after_final_step():
    """step_step() runs once more after the last step; unclamped poly
    evaluates (negative)**0.9 -> a COMPLEX lr."""
    cfg = _TrCfg()
    pol = LRPolicy(cfg, max_steps=5)
    for _ in range(10):                     # far past max_steps
        pol.step_step()
    assert isinstance(pol.lr, float)
    assert pol.lr == pytest.approx(cfg.lr_end)


def test_lr_policy_state_roundtrip():
    cfg = _TrCfg()
    pol = LRPolicy(cfg, max_steps=100)
    for _ in range(37):
        pol.step_step()
    state = pol.state_dict()

    fresh = LRPolicy(cfg, max_steps=100)
    assert fresh.lr != pol.lr               # schedule advanced
    fresh.load_state_dict(state)
    assert fresh.lr == pol.lr
    fresh.step_step()
    pol.step_step()
    assert fresh.lr == pol.lr               # continues in lockstep

    # plateau state (cannot be replayed from epoch count alone)
    cfg2 = _TrCfg()
    cfg2.lrp = "plateau"
    plat = LRPolicy(cfg2, max_steps=100)
    for v in (1.0, 1.1, 1.2, 1.3):          # no improvement -> decay
        plat.step_epoch(monitor_value=v)
    restored = LRPolicy(cfg2, max_steps=100)
    restored.load_state_dict(plat.state_dict())
    assert restored.lr == plat.lr
    assert restored._best == plat._best and restored._bad == plat._bad


def test_e2e_resume_reuses_run_dir_and_schedule(tmp_path):
    import entry.baseline as eb
    from pemp_tpu.core import checkpoint as ckpt_lib

    overrides = {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "2", "te.epochs": "1", "tr.ckpt_epoch": "1",
        "tr.lrp": "poly", "net.backbone": "vgg16",
        "g.model_dir": str(tmp_path),
    }
    # phase 1: 2 epochs (as if interrupted at a 4-epoch target)
    cfg, run = eb.ex.assemble("train", dict(overrides,
                                            **{"tr.total_epochs": "2"}))
    eb.BaselineRuntime(cfg, run).train()
    run_dir = Path(tmp_path) / cfg.tag / "1"
    ck = serialization.msgpack_restore(
        (run_dir / "ckpt.msgpack").read_bytes())
    assert ck["epoch"] == 2
    best_after_2 = ck["extra"]["best_iou"]
    steps_per_epoch = 2                     # train_n=4, bs=2
    assert ck["extra"]["lr_policy"]["_step"] == 2 * steps_per_epoch + 1

    # phase 2: resume to 4 epochs — must reuse run dir 1
    cfg2, run2 = eb.ex.assemble("train", dict(overrides, **{
        "tr.total_epochs": "4", "resume": "True", "exp_id": "1"}))
    assert run2._id == 1
    eb.BaselineRuntime(cfg2, run2).train()

    ck2 = serialization.msgpack_restore(
        (run_dir / "ckpt.msgpack").read_bytes())
    assert ck2["epoch"] == 4
    lr_state = ck2["extra"]["lr_policy"]
    # the schedule CONTINUED: 4 epochs of steps (+ poly's step-at-init),
    # not the 2*spe+1 a restarted schedule would show after epochs 3-4
    assert lr_state["_step"] == 4 * steps_per_epoch + 1
    # best-mIoU tracking carried over (never below the pre-resume best)
    assert ck2["extra"]["best_iou"] >= best_after_2

    # the pre-resume metric history survives (the resumed Run preloads
    # metrics.json instead of rewriting it from an empty dict)
    metrics = json.loads((run_dir / "metrics.json").read_text())
    assert len(metrics["train_loss"]) == 4          # epochs 1-4, not 3-4
    # original provenance preserved; the resume invocation is recorded
    # separately
    cfg_json = json.loads((run_dir / "config.json").read_text())
    assert cfg_json["tr.total_epochs"] == "2"       # phase-1 config intact
    cfg_resume = json.loads((run_dir / "config.resume.json").read_text())
    assert cfg_resume["tr.total_epochs"] == "4"

    # legacy checkpoints without `extra` still load
    payload = serialization.msgpack_restore(
        (run_dir / "ckpt.msgpack").read_bytes())
    del payload["extra"]
    legacy = run_dir / "legacy.msgpack"
    legacy.write_bytes(serialization.msgpack_serialize(payload))
    model = eb.BaselineRuntime(cfg2, run2)
    variables = model.init_variables()
    out = ckpt_lib.load(legacy, variables)
    assert out[2] == 4 and out[3] == {}
