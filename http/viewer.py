"""Result-viewer web app (dependency-free).

Counterpart of reference ``http/backend.py`` / ``http/backend_5shot.py``
(Flask, ports 17002/17003). Flask is not available in this image, so the
same surface is served with the stdlib ``http.server`` (a Flask app
factory is also provided and used automatically when flask exists):

- GET /                 -> the viewer page
- GET /api/experiments  -> experiment dir names for this shot count
- GET /api/samples?name=<exp> -> per-episode data.json + file lists

Artifacts come from the ``visualize`` command
(pemp_tpu/core/visualize.py) under ``http/static/``.
"""

from __future__ import annotations

import json
import urllib.parse
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

STATIC = Path(__file__).parent / "static"


def list_experiments(shot: int):
    return sorted(p.name for p in STATIC.glob(f"*_{shot}shot_*")
                  if p.is_dir())


def list_samples(name: str):
    out = []
    # the experiment name must be a bare directory name: an absolute
    # path would make ``STATIC / name`` escape the static root entirely
    # (pathlib discards the base), and separators/.. would traverse
    if not name or name != Path(name).name:
        return out
    exp_dir = STATIC / name
    if exp_dir.is_dir():
        for ep_dir in sorted(exp_dir.iterdir()):
            data_file = ep_dir / "data.json"
            if not data_file.exists():
                continue
            with open(data_file) as f:
                data = json.load(f)
            data["dir"] = f"{name}/{ep_dir.name}"
            data["files"] = sorted(p.name for p in ep_dir.iterdir()
                                   if p.suffix in (".jpg", ".png"))
            out.append(data)
    return out


def make_handler(shot: int):
    page = "index.html" if shot == 1 else "index_5shot.html"

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, directory=str(STATIC.parent), **kwargs)

        def _json(self, payload):
            blob = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/":
                self.path = f"/static/{page}"
                return super().do_GET()
            if parsed.path == "/api/experiments":
                return self._json(list_experiments(shot))
            if parsed.path == "/api/samples":
                q = urllib.parse.parse_qs(parsed.query)
                return self._json(list_samples(q.get("name", [""])[0]))
            if parsed.path.startswith("/static/"):
                return super().do_GET()
            self.send_error(404)

        def log_message(self, fmt, *args):
            pass

    return Handler


def create_flask_app(shot: int):
    from flask import Flask, jsonify, request, send_from_directory

    app = Flask(__name__, static_folder=str(STATIC), static_url_path="/static")
    page = "index.html" if shot == 1 else "index_5shot.html"

    @app.route("/")
    def index():
        return send_from_directory(str(STATIC), page)

    @app.route("/api/experiments")
    def experiments():
        return jsonify(list_experiments(shot))

    @app.route("/api/samples")
    def samples():
        return jsonify(list_samples(request.args.get("name", "")))

    return app


def main(shot: int, port: int):
    try:
        create_flask_app(shot).run(host="0.0.0.0", port=port)
    except ImportError:
        server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(shot))
        print(f"Serving {shot}-shot results viewer on :{port} (stdlib)")
        server.serve_forever()
