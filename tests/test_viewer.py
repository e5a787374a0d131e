"""Results-viewer HTTP endpoints (stdlib server, reference http/backend
surface: / page, /api/experiments, /api/samples)."""

import importlib.util
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path


def _load_viewer():
    # the repo's http/ dir is shadowed by the stdlib ``http`` package for
    # imports; the entries run it as a script, so load it by path here
    path = Path(__file__).parents[1] / "http" / "viewer.py"
    spec = importlib.util.spec_from_file_location("pemp_viewer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_static(tmp_path):
    static = tmp_path / "static"
    ep = static / "pemp_1shot_split0" / "ep000"
    ep.mkdir(parents=True)
    (ep / "data.json").write_text(json.dumps(
        {"cls": 3, "dice": 0.8, "names": ["a", "b"]}))
    (ep / "query.png").write_bytes(b"\x89PNG")
    (ep / "pred.jpg").write_bytes(b"\xff\xd8")
    (ep / "notes.txt").write_text("ignored")          # non-image filtered
    (static / "pemp_5shot_split0" / "ep000").mkdir(parents=True)
    (static / "index.html").write_text("<html>viewer</html>")
    return static


def test_listing_helpers(tmp_path, monkeypatch):
    viewer = _load_viewer()
    static = _make_static(tmp_path)
    monkeypatch.setattr(viewer, "STATIC", static)

    assert viewer.list_experiments(1) == ["pemp_1shot_split0"]
    assert viewer.list_experiments(5) == ["pemp_5shot_split0"]

    samples = viewer.list_samples("pemp_1shot_split0")
    assert len(samples) == 1
    s = samples[0]
    assert s["cls"] == 3 and s["dice"] == 0.8
    assert s["dir"] == "pemp_1shot_split0/ep000"
    assert s["files"] == ["pred.jpg", "query.png"]    # sorted, images only

    # traversal guard + unknown experiment
    assert viewer.list_samples("../secrets") == []
    assert viewer.list_samples("nope") == []


def test_http_endpoints(tmp_path, monkeypatch):
    from http.server import ThreadingHTTPServer

    viewer = _load_viewer()
    static = _make_static(tmp_path)
    monkeypatch.setattr(viewer, "STATIC", static)

    server = ThreadingHTTPServer(("127.0.0.1", 0), viewer.make_handler(1))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                return r.status, r.read()

        status, body = get("/api/experiments")
        assert status == 200 and json.loads(body) == ["pemp_1shot_split0"]

        status, body = get("/api/samples?name=pemp_1shot_split0")
        data = json.loads(body)
        assert status == 200 and data[0]["files"] == ["pred.jpg", "query.png"]

        status, body = get("/")                      # serves the viewer page
        assert status == 200 and b"viewer" in body

        status, body = get("/static/pemp_1shot_split0/ep000/query.png")
        assert status == 200 and body.startswith(b"\x89PNG")

        try:
            get("/etc/passwd")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_list_samples_rejects_absolute_and_nested_paths(tmp_path, monkeypatch):
    """`STATIC / name` with an absolute name escapes the static root
    entirely (pathlib discards the base) — only bare dir names pass."""
    viewer = _load_viewer()
    monkeypatch.setattr(viewer, "STATIC", _make_static(tmp_path))
    assert viewer.list_samples("/etc") == []
    assert viewer.list_samples(str(tmp_path)) == []
    assert viewer.list_samples("a/b") == []
    assert viewer.list_samples("..") == []
    assert viewer.list_samples("") == []
