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


def test_observer_file_mode_keeps_integer_ids(tmp_path):
    """File mode: run dirs are already tag-scoped, so the doc keeps the
    bare integer _id (Sacred/Omniboard sort runs by numeric _id)."""
    a = MongoRunObserver("baseline", 1, "train", {}, run_dir=tmp_path,
                         tag="drop0")
    b = MongoRunObserver("baseline", 1, "train", {},
                         run_dir=tmp_path / "other", tag="drop5")
    assert a.doc_id == 1 and b.doc_id == 1
    a.log_scalar("loss", 1.0, 0)
    a.finish()
    run = _read_docs(tmp_path / "mongo" / "runs.json")[0]
    assert run["_id"] == 1
    # provenance fields still resolve the doc back to the per-tag run
    assert run["pemp_tag"] == "drop0" and run["pemp_run_id"] == 1
    m = _read_docs(tmp_path / "mongo" / "metrics.json")[0]
    assert m["_id"] == "1.loss" and m["run_id"] == 1


# --------------------------------------------------------------------------
# DB mode (live pymongo), exercised via an in-memory fake client covering
# the operations the observer issues: find_one(filter, sort), replace_one
# and update_one($setOnInsert/$push) with upsert.

class _FakeCollection:
    def __init__(self):
        self.docs = {}

    @staticmethod
    def _match(doc, flt):
        for k, v in flt.items():
            if isinstance(v, dict) and "$type" in v:
                if v["$type"] == "number" and not isinstance(
                        doc.get(k), (int, float)):
                    return False
            elif doc.get(k) != v:
                return False
        return True

    def find_one(self, flt, sort=None):
        import copy
        hits = [d for d in self.docs.values() if self._match(d, flt)]
        if sort:
            key, direction = sort[0]
            hits.sort(key=lambda d: d.get(key), reverse=direction < 0)
        return copy.deepcopy(hits[0]) if hits else None

    def replace_one(self, flt, doc, upsert=False):
        import copy
        for _id, d in list(self.docs.items()):
            if self._match(d, flt):
                self.docs[_id] = copy.deepcopy(doc)
                return
        if upsert:
            self.docs[doc["_id"]] = copy.deepcopy(doc)

    def update_one(self, flt, update, upsert=False):
        doc = next((d for d in self.docs.values() if self._match(d, flt)),
                   None)
        if doc is None:
            if not upsert:
                return
            doc = dict(flt)
            doc.update(update.get("$setOnInsert", {}))
            self.docs[doc["_id"]] = doc
        for k, v in update.get("$push", {}).items():
            doc.setdefault(k, []).append(v)


@pytest.fixture
def fake_mongo(monkeypatch):
    import sys
    import types
    dbs = {}

    class _Admin:
        @staticmethod
        def command(*a, **k):
            pass

    class _FakeClient:
        def __init__(self, *a, **k):
            self.admin = _Admin()

        def __getitem__(self, name):
            return dbs.setdefault(name, types.SimpleNamespace(
                runs=_FakeCollection(), metrics=_FakeCollection()))

    monkeypatch.setitem(sys.modules, "pymongo",
                        types.SimpleNamespace(MongoClient=_FakeClient))
    return dbs


def test_observer_db_mode_tags_get_distinct_integer_ids(fake_mongo):
    """DB mode: the db is keyed by experiment name only while file run
    ids are per-tag — same (experiment, run_id) under two tags must get
    distinct INTEGER _ids (ADVICE r2: upsert used to clobber; the r3 fix
    must not break the Sacred integer-id schema Omniboard sorts by)."""
    a = MongoRunObserver("baseline", 1, "train", {}, tag="drop0")
    b = MongoRunObserver("baseline", 1, "train", {}, tag="drop5")
    assert a.doc_id == 1 and b.doc_id == 2
    a.log_scalar("loss", 0.9, 0)
    b.log_scalar("loss", 0.5, 0)
    a.finish()
    b.finish()
    runs = fake_mongo["baseline"].runs.docs
    assert set(runs) == {1, 2}            # nothing clobbered
    metrics = fake_mongo["baseline"].metrics.docs
    assert metrics["1.loss"]["run_id"] == 1
    assert metrics["2.loss"]["run_id"] == 2


def test_observer_db_mode_resume_reuses_doc(fake_mongo):
    """Resuming the same (tag, run_id) reuses the allocated _id,
    preserves start_time, and appends to metric arrays via $push."""
    a = MongoRunObserver("baseline", 1, "train", {}, tag="t")
    a.log_scalar("loss", 0.9, 0)
    a.finish("INTERRUPTED")
    t0 = fake_mongo["baseline"].runs.docs[1]["start_time"]

    b = MongoRunObserver("baseline", 1, "train", {}, tag="t")
    assert b.doc_id == 1
    b.log_scalar("loss", 0.7, 1)
    b.finish("COMPLETED", "mIoU: 50")
    run = fake_mongo["baseline"].runs.docs[1]
    assert run["start_time"] == t0
    assert run["status"] == "COMPLETED"
    assert [m["name"] for m in run["info"]["metrics"]] == ["loss"]
    m = fake_mongo["baseline"].metrics.docs["1.loss"]
    assert m["steps"] == [0, 1] and m["values"] == [0.9, 0.7]
