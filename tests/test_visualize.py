"""End-to-end ``visualize`` command (reference evaluate_and_save,
core/base_trainer.py:311-403): artifacts + data.json land under
http/static and are consumable by the results viewer."""

import json
from pathlib import Path

import numpy as np


def test_visualize_writes_viewer_consumable_artifacts(tmp_path, monkeypatch):
    import entry.pemp_stage1 as e1
    from tests.test_viewer import _load_viewer

    monkeypatch.chdir(tmp_path)      # model_dir under tmp
    monkeypatch.setenv("PEMP_HTTP_STATIC", str(tmp_path / "static"))

    overrides = {
        "split": "0", "data.dataset": "SYNTH", "data.height": "33",
        "data.width": "33", "data.bs": "2", "data.train_n": "4",
        "data.test_n": "3", "te.epochs": "1", "tr.total_epochs": "1",
        "net.backbone": "vgg16", "g.model_dir": str(tmp_path / "model_dir"),
    }
    cfg, run = e1.ex.assemble("train", overrides)
    e1.Stage1Runtime(cfg, run).train()

    cfg2, run2 = e1.ex.assemble("visualize", dict(overrides, **{
        "exp_id": "1"}), observed=False)
    out_dir = e1.Stage1Runtime(cfg2, run2).visualize()

    out = Path(out_dir)
    assert out.exists() and "1shot" in out.name
    eps = sorted(p for p in out.iterdir() if p.is_dir())
    assert len(eps) == 3             # one dir per test episode
    for ep in eps:
        data = json.loads((ep / "data.json").read_text())
        for key in ("acc", "cls_id", "cls_name", "qry", "sup"):
            assert key in data, key
        pngs = list(ep.glob("*.png"))
        jpgs = list(ep.glob("*.jpg"))
        # sup mask + qry mask + qry pred + response color / sup + qry imgs
        assert len(pngs) == 4 and len(jpgs) == 2
        pred = [p for p in pngs if "_qry_pred_" in p.name]
        assert pred, [p.name for p in pngs]

    # the viewer can list and serve exactly what visualize wrote
    viewer = _load_viewer()
    monkeypatch.setattr(viewer, "STATIC", out.parent)
    assert out.name in viewer.list_experiments(1)
    samples = viewer.list_samples(out.name)
    assert len(samples) == 3
    assert all(s["files"] for s in samples)
