"""The real-data closure runbook (tools/verify_real_data.py, VERDICT r3
#5) must be runnable the day data lands with zero new engineering — so
its mechanics are tested NOW, in the data-less image:

- the bare invocation exits 0 with every phase SKIPped (env gaps are
  not failures) and prints the full phase-5 command matrix (the
  runbook's dry-run contract);
- phase 4's trained-checkpoint round-trip actually executes against a
  generated reference-layout ``.pth`` (export CLI -> convert CLI ->
  export CLI, bit-compare) — no datasets required.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

ROOT = Path(__file__).parents[1]

sys.path.insert(0, str(ROOT))


def _env():
    import os
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env.update({"JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache"})
    return env


def test_dataless_image_all_phases_skip():
    out = subprocess.run(
        [sys.executable, "tools/verify_real_data.py",
         "--splits", "0", "--shots", "1",
         "--families", "pemp_stage1,pemp_stage2"],
        cwd=ROOT, env=_env(), capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    for phase in ("1 inventory", "2 goldens", "3 rasterizer",
                  "4 convert", "5 miou"):
        assert f"[SKIP] {phase}" in out.stdout, out.stdout
    # the dry-run command matrix is the runbook
    assert "entry/pemp_stage2.py test" in out.stdout
    assert "s1.id=100" in out.stdout          # cascade prior wiring
    assert "target 55.74" in out.stdout       # published table wired in


@pytest.mark.slow
def test_phase_convert_roundtrips_generated_pth(tmp_path):
    """Generate a reference-layout pemp_stage1 .pth (the export CLI's
    own output on random weights), drop it in a --ckpt-dir with the
    naming convention, and assert phase 4 reports it bit-exact."""
    from tools.convert_reference_ckpt import build_init_trees
    from tools.export_reference_ckpt import export_trained

    _, params, stats = build_init_trees("pemp_stage1", "resnet50",
                                        shot=1, seed=3)
    rng = np.random.default_rng(11)
    params = _rand(params, rng)
    stats = _rand(stats, rng)
    sd = export_trained("pemp_stage1", "resnet50", params, stats)
    ckdir = tmp_path / "ckpts"
    ckdir.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               ckdir / "pemp_stage1_pascal_split0_shot1.pth")

    out = subprocess.run(
        [sys.executable, "tools/verify_real_data.py",
         "--ckpt-dir", str(ckdir), "--splits", "0", "--shots", "1",
         "--families", "pemp_stage1"],
        cwd=ROOT, env=_env(), capture_output=True, text=True,
        timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    assert "[OK  ] 4 convert" in out.stdout, out.stdout
    assert "round-trip bit-exact" in out.stdout


def _rand(tree, rng):
    import jax
    return jax.tree_util.tree_map(
        lambda a: rng.standard_normal(a.shape).astype(a.dtype), tree)
