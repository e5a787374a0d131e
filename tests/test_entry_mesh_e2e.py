"""Every model family trains end-to-end under a multi-device mesh.

The toy-model equality test (test_multichip.py) proves the GSPMD
all-reduce math and dryrun_multichip covers the flagship, but the other
six families' train steps had never executed under a mesh — RPMMs'
EM fori_loop, PFENet's stop-grad pyramid, CaNet's host-side history
write-back and the stage-2 prior chain all partition differently.
Each case here runs the REAL entry runtime (config -> sharded loader ->
make_train_step on the 8-virtual-device CPU mesh -> eval -> auto-test)
with episodes sharded over the batch axis (``tpu.mesh=8``).
"""

import importlib

import pytest

COMMON = {
    "split": "0", "data.dataset": "SYNTH", "data.height": "33",
    "data.width": "33", "data.bs": "8", "data.train_n": "8",
    "data.test_n": "2", "te.epochs": "1", "tr.total_epochs": "1",
    "tpu.mesh": "8",
}

CASES = [
    ("baseline", {"net.backbone": "vgg16"}),
    ("pemp_stage1", {"net.backbone": "vgg16"}),
    ("panet", {"net.backbone": "vgg16"}),
    ("canet", {}),                                    # resnet50-only
    ("rpmms", {}),
    # PFENet's deep-base trunk needs (hw-1) % 8 == 0
    ("pfenet", {"data.height": "41", "data.width": "41"}),
]


def _train(entry_name, tmp_path, extra):
    mod = importlib.import_module(f"entry.{entry_name}")
    cfg, run = mod.ex.assemble(
        "train", {**COMMON, "g.model_dir": str(tmp_path), **extra})
    runtime = {
        "baseline": lambda: mod.BaselineRuntime,
        "pemp_stage1": lambda: mod.Stage1Runtime,
        "panet": lambda: mod.PANetRuntime,
        "canet": lambda: mod.CaNetRuntime,
        "rpmms": lambda: mod.RPMMsRuntime,
        "pfenet": lambda: mod.PFENetRuntime,
        "pemp_stage2": lambda: mod.Stage2Runtime,
    }[entry_name]()
    return runtime(cfg, run).train()


@pytest.mark.parametrize("entry_name,extra", CASES)
def test_family_trains_under_mesh(entry_name, extra, tmp_path):
    result = _train(entry_name, tmp_path, extra)
    assert result is not None and "mIoU" in result


def test_stage2_cascade_trains_under_mesh(tmp_path):
    """Stage 2 consumes a stage-1 run's frozen prior — the full cascade
    under the mesh (reference entry/pemp_stage2.py:58-65)."""
    _train("pemp_stage1", tmp_path, {"net.backbone": "vgg16"})
    result = _train("pemp_stage2", tmp_path,
                    {"net.backbone": "vgg16", "net.backbone2": "vgg16",
                     "s1.id": "1"})
    assert result is not None and "mIoU" in result
