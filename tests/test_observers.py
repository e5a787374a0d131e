"""Omniboard/Mongo-compatible observer (file-fallback mode).

Verifies the documents match Sacred's MongoObserver schema — the fields
Omniboard actually reads — and that the mongoimport files are valid
one-doc-per-line extended JSON. Reference: utils/misc.py:34-45.
"""

import json

import pytest

from pemp_tpu.config import Config
from pemp_tpu.config.cli import Run
from pemp_tpu.utils.observers import MongoRunObserver, maybe_attach


def _read_docs(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_observer_file_fallback_schema(tmp_path):
    obs = MongoRunObserver("pemp_stage1", 3, "train", {"split": "0"},
                           run_dir=tmp_path)
    for step, v in enumerate([0.9, 0.7, 0.5]):
        obs.log_scalar("loss", v, step)
    obs.log_scalar("miou", 0.42, 0)
    obs.finish("COMPLETED", "mIoU: 42.00")

    runs = _read_docs(tmp_path / "mongo" / "runs.json")
    assert len(runs) == 1
    run = runs[0]
    # the keys Omniboard requires on a run document
    for key in ("_id", "experiment", "command", "host", "config",
                "start_time", "stop_time", "heartbeat", "status",
                "result", "info"):
        assert key in run, key
    assert run["_id"] == 3
    assert run["experiment"]["name"] == "pemp_stage1"
    assert run["status"] == "COMPLETED"
    assert run["result"] == "mIoU: 42.00"
    assert run["start_time"].keys() == {"$date"}     # extended JSON date
    assert {m["name"] for m in run["info"]["metrics"]} == {"loss", "miou"}

    metrics = {m["name"]: m for m in
               _read_docs(tmp_path / "mongo" / "metrics.json")}
    assert metrics["loss"]["run_id"] == 3
    assert metrics["loss"]["steps"] == [0, 1, 2]
    assert metrics["loss"]["values"] == [0.9, 0.7, 0.5]
    assert len(metrics["loss"]["timestamps"]) == 3
    assert metrics["loss"]["timestamps"][0].keys() == {"$date"}
    # run.info.metrics ids must link to metric _ids
    ids = {m["id"] for m in run["info"]["metrics"]}
    assert ids == {metrics[n]["_id"] for n in metrics}


def test_observer_failed_status(tmp_path):
    obs = MongoRunObserver("baseline", 1, "train", {}, run_dir=tmp_path)
    obs.finish("FAILED")
    run = _read_docs(tmp_path / "mongo" / "runs.json")[0]
    assert run["status"] == "FAILED"


def test_maybe_attach_gating(tmp_path):
    cfg = Config(tag="t")
    run = Run(5, tmp_path)
    maybe_attach(run, cfg, "baseline", "train")     # mongodb defaults off
    assert run.observers == []

    cfg.g.mongodb = True
    maybe_attach(run, cfg, "baseline", "train")
    assert len(run.observers) == 1
    run.log_scalar("loss", 1.0, 0)                  # fans out to the sink
    run.finish("COMPLETED", 0.5)
    docs = _read_docs(tmp_path / "mongo" / "metrics.json")
    assert docs[0]["name"] == "loss"
    run2 = _read_docs(tmp_path / "mongo" / "runs.json")[0]
    assert run2["result"] == 0.5

    unobserved = Run(None, None)
    maybe_attach(unobserved, cfg, "baseline", "train")   # -u: no observers
    assert unobserved.observers == []


def test_observer_requires_run_dir_without_mongo():
    with pytest.raises(RuntimeError):
        MongoRunObserver("baseline", 1, "train", {}, run_dir=None)


def test_observer_tag_namespaces_doc_ids(tmp_path):
    """Runs under different tags of one experiment must not share doc
    _ids (ADVICE r2: replace_one(upsert) would silently clobber the
    earlier run's document in a name-keyed db)."""
    a = MongoRunObserver("baseline", 1, "train", {}, run_dir=tmp_path,
                         tag="drop0")
    b = MongoRunObserver("baseline", 1, "train", {},
                         run_dir=tmp_path / "other", tag="drop5")
    assert a.doc_id != b.doc_id
    a.log_scalar("loss", 1.0, 0)
    a.finish()
    m = _read_docs(tmp_path / "mongo" / "metrics.json")[0]
    assert m["_id"].startswith("drop0/")
