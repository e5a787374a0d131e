"""Entry-level worker for tests/test_distributed_2proc.py (NOT collected).

Runs the FULL framework pipeline — ``ex.assemble`` -> ``EntryRuntime``
train (host-sharded loader, process-local global-batch assembly,
rank-0-only recording) -> broadcast auto-test chain -> evaluator with
multi-host-safe fetches — in a real ``jax.distributed`` world.

Usage:
  python tests/distributed_entry_worker.py <out.json> <model_dir> <bs> \
      [entry=baseline] [mode=train]

Modes:
  train    one train() incl. the auto-test chain (default)
  resume   train 1 epoch, then a SECOND invocation with resume=True
           exp_id=1 tr.total_epochs=2 — exercises the multi-host
           checkpoint-bytes broadcast in ``Trainer.maybe_resume``
  stage2   train pemp_stage1, then pemp_stage2 with s1.id=1 — exercises
           the stage-1 snapshot broadcast (``load_snapshot_broadcast``)
  fused    train with tpu.fuse_steps=2 — the fused lax.scan launch's
           collectives (gradient all-reduce inside the scan body) must
           execute identically across a REAL process-spanning mesh
  preempt  train with a long epoch budget while the PARENT SIGTERMs one
           rank mid-run: the world-OR stop consensus must stop EVERY
           rank at the same epoch boundary (train() returns
           "PREEMPTED"); then a second invocation resumes to completion
  fused_preempt
           preempt composed with tpu.fuse_steps=2 (VERDICT r3 #7): the
           SIGTERM lands while ranks are inside/between fused chunks,
           the consensus fires on the chunk-boundary/epoch-boundary
           schedule, and the resumed run (also fused) replays the
           interrupted epoch exactly once — so the final recorded
           stream holds each epoch once, rank-identical

(single-process reference when COORDINATOR_ADDRESS is unset; pass the
GLOBAL batch size then)
"""

import faulthandler
import json
import re
import sys
from pathlib import Path

# worlds that wedge (collective deadlocks, Gloo stalls) starve silently
# otherwise: dump every rank's stacks to stderr every 10 min so a
# killed-at-deadline rank's log tail shows WHERE it sat
faulthandler.dump_traceback_later(600, repeat=True, exit=False)

sys.path.insert(0, str(Path(__file__).parents[1]))

from pemp_tpu.parallel.mesh import initialize_distributed

distributed = initialize_distributed()   # before any backend touch

import jax  # noqa: E402


def run_train(entry_name, overrides):
    import importlib

    eb = importlib.import_module(f"entry.{entry_name}")
    rt_cls = next(v for k, v in vars(eb).items()
                  if k.endswith("Runtime") and k != "EntryRuntime")
    cfg, run = eb.ex.assemble("train", overrides)
    return rt_cls(cfg, run).train()   # auto-test chain


def main(out_path, model_dir, bs, entry_name="baseline", mode="train"):
    overrides = {
        "split": "0", "data.dataset": "SYNTH",
        "data.height": "17", "data.width": "17",
        "data.bs": str(bs), "data.train_n": "8",
        "data.test_n": "4", "data.test_bs": "2",
        "te.epochs": "1", "tr.total_epochs": "2",
        "g.model_dir": model_dir,
    }
    if entry_name == "baseline":
        overrides["net.backbone"] = "vgg16"
    if entry_name == "canet":
        # random frozen features learn nothing; the smoke only needs the
        # history store + backward to execute
        overrides["net.freeze_backbone"] = "False"

    if mode == "resume":
        # phase 1: one epoch (writes run 1 + ckpt.msgpack on rank 0)
        run_train(entry_name, {**overrides, "tr.total_epochs": "1"})
        # phase 2: fresh invocation resumes run 1 and trains epoch 2;
        # multi-host, the ckpt BYTES broadcast from rank 0
        result = run_train(entry_name, {**overrides, "resume": "True",
                                        "exp_id": "1"})
    elif mode == "preempt":
        # long epoch budget; the parent signals one rank once rank 0's
        # metrics stream shows progress. Every rank must agree to stop
        # (world-OR on the epoch-boundary schedule) and exit through a
        # resumable snapshot instead of wedging in the collectives.
        result = run_train(entry_name, {**overrides,
                                        "tr.total_epochs": "50"})
        assert result == "PREEMPTED", f"expected PREEMPTED, got {result!r}"
        # second invocation: resume the interrupted run to completion
        # (short budget) and fall through to the normal metric parse
        result = run_train(entry_name, {**overrides, "resume": "True",
                                        "exp_id": "1",
                                        "tr.total_epochs": "3"})
    elif mode == "fused":
        result = run_train(entry_name, {**overrides,
                                        "tpu.fuse_steps": "2"})
    elif mode == "fused_preempt":
        # train_n=16: in a 4-process world the default 8-episode stream
        # shards to ONE step per rank per epoch — every epoch would be
        # a serial tail and the fused chunk would never execute
        overrides["data.train_n"] = "16"
        result = run_train(entry_name, {**overrides,
                                        "tr.total_epochs": "50",
                                        "tpu.fuse_steps": "2"})
        assert result == "PREEMPTED", f"expected PREEMPTED, got {result!r}"
        result = run_train(entry_name, {**overrides, "resume": "True",
                                        "exp_id": "1",
                                        "tr.total_epochs": "5",
                                        "tpu.fuse_steps": "2"})
    elif mode == "stage2":
        run_train("pemp_stage1", {**overrides, "data.height": "33",
                                  "data.width": "33",
                                  "net.backbone": "vgg16",
                                  "tr.total_epochs": "1"})
        # stage-2 loads run 1's stage-1 snapshot: under multi-host rank 0
        # reads the bytes and broadcasts them to the world
        result = run_train("pemp_stage2", {
            **overrides, "data.height": "33", "data.width": "33",
            "tr.total_epochs": "1", "net.backbone": "vgg16",
            "net.backbone2": "vgg16", "s1.id": "1"})
    else:
        result = run_train(entry_name, overrides)

    m = re.search(r"Loss: ([\d.]+), mIoU: ([\d.]+), bIoU: ([\d.]+)",
                  result or "")
    assert m, f"unexpected test result: {result!r}"

    # rank 0's run dir carries the recorded train-loss stream
    train_loss = None
    metrics = sorted(Path(model_dir).glob("*/*/metrics.json"))
    if metrics:   # {"train_loss": [[step, value], ...], ...}
        doc = json.load(open(metrics[0]))
        train_loss = [v for _, v in doc.get("train_loss", [])]

    json.dump({
        "distributed": bool(distributed),
        "rank": int(jax.process_index()),
        "world": int(jax.process_count()),
        "loss": float(m.group(1)),
        "miou": float(m.group(2)),
        "biou": float(m.group(3)),
        "train_loss": train_loss,
    }, open(out_path, "w"))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         *sys.argv[4:6])
