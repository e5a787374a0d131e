"""Omniboard/Mongo-compatible run observer.

The reference attaches a Sacred ``MongoObserver`` so runs can be browsed
in Omniboard (reference utils/misc.py:34-45, config.py:17-19: flags
``g.mongodb`` / ``g.mongo_port``, db name = experiment name). This module
reproduces that sink without depending on Sacred:

- documents follow Sacred's MongoObserver schema (``runs`` collection:
  _id/experiment/command/host/start_time/config/status/result/heartbeat;
  ``metrics`` collection: name/run_id/steps/values/timestamps with an
  ``info.metrics`` link list on the run) — exactly what Omniboard reads;
- when ``pymongo`` is importable the documents go straight to
  ``mongodb://localhost:<port>/<db>``;
- when it is not (this image), the same documents are written as
  MongoDB extended JSON under ``<run_dir>/mongo/{runs,metrics}.json`` so
  ``mongoimport --db <name> --collection runs|metrics`` recreates the
  Omniboard-ready database byte-for-byte later.

Unlike the reference (config.py:33-36 turns fileStorage OFF when mongo
is on), the file-based run dir stays on either way — checkpoints live
there.
"""

from __future__ import annotations

import json
import platform
import socket
import sys
import time
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, List, Optional


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class MongoRunObserver:
    """One run's Sacred-schema sink (live Mongo or mongoimport files)."""

    def __init__(self, name: str, run_id: int, command: str, config: Dict,
                 port: int = 7000, run_dir: Optional[Path] = None,
                 tag: str = ""):
        self.name = name
        self.run_id = run_id
        self.tag = tag
        self._metrics: Dict[str, Dict] = {}
        self._db = None
        self._dir = None
        self._pending = 0
        self._last_flush = time.monotonic()
        try:
            import pymongo                                   # noqa: F401
            client = pymongo.MongoClient(
                f"mongodb://localhost:{port}/", serverSelectionTimeoutMS=2000)
            client.admin.command("ping")
            self._db = client[name]
        except Exception:
            if run_dir is None:
                raise RuntimeError(
                    "g.mongodb=True but pymongo/mongod is unavailable and "
                    "there is no run dir for the mongoimport fallback "
                    "(unobserved run). Drop -u or set g.mongodb=False.")
            self._dir = Path(run_dir) / "mongo"
            self._dir.mkdir(parents=True, exist_ok=True)

        prev_run = None
        if self._dir is not None:
            # file mode: the run dir is already tag-scoped, keep the bare
            # int id (Sacred/Omniboard sort runs by integer _id)
            self.doc_id = run_id
            self._preload_metrics()
        else:
            # DB mode: file run ids are allocated PER TAG while the db is
            # keyed by experiment name only, so a (tag, run_id) pair from
            # another tag must not clobber this one. Sacred-style: reuse
            # the doc previously allocated for THIS (tag, run_id) — the
            # resume path, whose metric arrays grow in place via $push and
            # whose start_time/info.metrics must survive the replace below
            # — else allocate the next integer _id from the collection.
            prev_run = self._db.runs.find_one(
                {"pemp_tag": tag, "pemp_run_id": run_id})
            if prev_run is not None:
                self.doc_id = prev_run["_id"]
            else:
                top = self._db.runs.find_one(
                    {"_id": {"$type": "number"}}, sort=[("_id", -1)])
                self.doc_id = int(top["_id"]) + 1 if top else 1

        self._run_doc = {
            "_id": self.doc_id,
            # provenance fields resolving the db id back to the per-tag
            # file run (also what the DB-mode resume lookup keys on)
            "pemp_tag": tag,
            "pemp_run_id": run_id,
            "format": "MongoObserver-0.7.0",
            "experiment": {"name": name, "base_dir": str(Path.cwd()),
                           "sources": [], "dependencies": [],
                           "repositories": [],
                           "mainfile": Path(sys.argv[0]).name},
            "command": command,
            "host": {"hostname": socket.gethostname(),
                     "os": [platform.system(), platform.platform()],
                     "python_version": platform.python_version(),
                     "cpu": platform.processor(), "ENV": {}},
            "meta": {"command": command,
                     "options": {"--unobserved": False}},
            "config": config,
            "start_time": _now(),
            "heartbeat": _now(),
            "status": "RUNNING",
            "resources": [], "artifacts": [], "captured_out": "",
            "info": {"metrics": []},
            "result": None,
        }
        for m in self._metrics.values():    # preloaded (resumed) metrics
            self._run_doc["info"]["metrics"].append(
                {"name": m["name"], "id": m["_id"]})
        if prev_run is not None:            # DB-mode resume
            if prev_run.get("start_time") is not None:
                self._run_doc["start_time"] = prev_run["start_time"]
            for link in prev_run.get("info", {}).get("metrics", []):
                if link not in self._run_doc["info"]["metrics"]:
                    self._run_doc["info"]["metrics"].append(link)
                    # mark as known so log_scalar $pushes instead of
                    # re-linking
                    self._metrics[link["name"]] = {
                        "_id": link["id"], "name": link["name"],
                        "run_id": self.doc_id, "_db_linked": True,
                        "steps": [], "values": [], "timestamps": []}
        self._write_run()

    def _preload_metrics(self) -> None:
        """Resumed runs reuse the run dir; keep the pre-resume metric
        history instead of overwriting the documents with only
        post-resume points."""
        path = self._dir / "metrics.json"
        if not path.exists():
            return
        try:
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    doc = json.loads(line)
                    doc["timestamps"] = [
                        datetime.fromisoformat(t["$date"].rstrip("Z"))
                        if isinstance(t, dict) else t
                        for t in doc.get("timestamps", [])]
                    self._metrics[doc["name"]] = doc
        except Exception:
            pass

    # ------------------------------------------------------------------
    FLUSH_EVERY = 100       # scalars between file flushes
    FLUSH_SECS = 30.0       # ... or at most this long between flushes

    def log_scalar(self, metric: str, value: float, step: int) -> None:
        now = _now()
        m = self._metrics.get(metric)
        fresh = m is None
        if fresh:
            m = self._metrics[metric] = {
                "_id": f"{self.doc_id}.{metric}",
                "name": metric, "run_id": self.doc_id,
                "steps": [], "values": [], "timestamps": []}
            self._run_doc["info"]["metrics"].append(
                {"name": metric, "id": m["_id"]})
        self._run_doc["heartbeat"] = now
        if self._db is not None:
            # incremental $push (arrays grow server-side) — a per-scalar
            # replace_one would resend the whole history: O(n^2) bytes
            self._db.metrics.update_one(
                {"_id": m["_id"]},
                {"$setOnInsert": {"name": metric, "run_id": self.doc_id},
                 "$push": {"steps": int(step), "values": float(value),
                           "timestamps": now}},
                upsert=True)
            self._pending += 1
            # run-doc writes (heartbeat + metric links) batched like the
            # file mode; a fresh metric flushes immediately so Omniboard
            # sees the link
            if (fresh or self._pending >= self.FLUSH_EVERY
                    or time.monotonic() - self._last_flush > self.FLUSH_SECS):
                self._pending = 0
                self._last_flush = time.monotonic()
                self._write_run()
            return
        m["steps"].append(int(step))
        m["values"].append(float(value))
        m["timestamps"].append(now)
        # file mode rewrites full documents (mongoimport has no $push),
        # so batch the disk writes — per-scalar rewriting would be
        # O(total^2) bytes over a training run
        self._pending += 1
        if (self._pending >= self.FLUSH_EVERY
                or time.monotonic() - self._last_flush > self.FLUSH_SECS):
            self._flush_files()

    def finish(self, status: str = "COMPLETED", result=None) -> None:
        self._run_doc["status"] = status
        self._run_doc["stop_time"] = _now()
        self._run_doc["heartbeat"] = _now()
        if result is not None:
            self._run_doc["result"] = result if isinstance(
                result, (int, float)) else str(result)
        if self._db is not None:
            self._write_run()
        else:
            self._flush_files()

    def _flush_files(self) -> None:
        self._pending = 0
        self._last_flush = time.monotonic()
        if self._metrics:
            self._dump("metrics.json", list(self._metrics.values()))
        self._dump("runs.json", [self._run_doc])

    # ------------------------------------------------------------------
    def _write_run(self) -> None:
        if self._db is not None:
            self._db.runs.replace_one({"_id": self.doc_id}, self._run_doc,
                                      upsert=True)
        else:
            self._dump("runs.json", [self._run_doc])

    def _dump(self, fname: str, docs: List[Dict]) -> None:
        # MongoDB extended JSON: one document per line (mongoimport's
        # default format); datetimes as {"$date": ISO-8601}.
        def ext(o):
            if isinstance(o, datetime):
                return {"$date": o.isoformat(timespec="milliseconds") + "Z"}
            if isinstance(o, dict):
                return {k: ext(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [ext(v) for v in o]
            return o

        tmp = self._dir / (fname + ".tmp")
        with open(tmp, "w") as f:
            for doc in docs:
                f.write(json.dumps(ext(doc)) + "\n")
        tmp.replace(self._dir / fname)


def maybe_attach(run, cfg, name: str, command: str) -> None:
    """Attach a MongoRunObserver to a Run when ``g.mongodb`` is set
    (reference utils/misc.py:53 attaches per-experiment, db=NAME)."""
    if not getattr(cfg.g, "mongodb", False):
        return
    if run._id is None:     # -u / --unobserved disables every observer
        return
    from pemp_tpu.config.base import flatten_config
    config = {k: repr(v) for k, v in flatten_config(cfg).items()}
    run.observers.append(MongoRunObserver(
        name, run._id, command, config,
        port=cfg.g.mongo_port, run_dir=run.run_dir,
        tag=str(getattr(cfg, "tag", "") or "")))
