"""`--serve`: watch AND control a render from a browser — the headless
analog of the reference's interactive viewer (`CGL/src/viewer.cpp:142-170`
GLFW loop + `PathTracer::update_screen` glDrawPixels blit,
`pathtracer.cpp:156-178`) including its runtime key_press parameter
control (`pathtracer.cpp:463-547`).

A tiny stdlib HTTP server runs in a daemon thread and serves:
  /             an auto-refreshing page: progressive preview + controls
  /preview.png  the current preview PNG bytes (no-cache)
  /status.json  {"samples": n, "total": m, "done": bool}
  /control      POST {"action":"stop"} | {"spp_cap": N} |
                {"preview_every": N} — the key_press analog: stop the
                render cleanly, cap samples/pixel live, or change the
                preview cadence. State lands in `self.control`, a dict
                the renderer polls between passes
                (`Renderer.render(control=...)`).
  /accel.png    the interactive accel-structure walk overlay (when
                constructed with `accel=AccelWalk(...)`) — the headless
                analog of visualize_accel (`pathtracer.cpp:330-423`);
                arrow keys on the page POST {"accel":"up"|"left"|
                "right"} exactly like the reference's selection stack
                (`pathtracer.cpp:520-534`).

The renderer keeps writing its progressive preview PNG between passes
(`Renderer.render(preview_path=...)`); the page re-fetches it every
second, which is exactly the viewer's frame-loop blit cadence for a
long-running render.
"""
from __future__ import annotations

import http.server
import json
import threading


_PAGE = """<!doctype html>
<html><head><title>rrt_tpu render</title><style>
body {{ background:#111; color:#ccc; font-family:monospace;
        text-align:center; }}
img {{ image-rendering:pixelated; max-width:95vw; max-height:80vh;
       border:1px solid #444; margin-top:1em; }}
button, input {{ background:#222; color:#ccc; border:1px solid #555;
       font-family:monospace; padding:2px 8px; margin:0 4px; }}
</style></head><body>
<div id="st">rendering…</div>
<div style="margin-top:0.5em">
  <button onclick="ctl({{action:'stop'}})">stop</button>
  spp cap <input id="cap" size="5">
  <button onclick="ctl({{spp_cap:+document.getElementById('cap').value}})">
    set</button>
  preview every <input id="pe" size="4">
  <button onclick="ctl({{preview_every:
    +document.getElementById('pe').value}})">set</button>
</div>
<img id="im" src="/preview.png">
<div id="acd" style="display:none">
  <div>accel walk: arrows navigate (↑ parent, ← child, → sibling)</div>
  <div id="acs"></div>
  <img id="ac" src="/accel.png">
</div>
<script>
function ctl(body) {{
  return fetch('/control', {{method:'POST', body:JSON.stringify(body)}});
}}
setInterval(() => {{
  fetch('/status.json').then(r => r.json()).then(s => {{
    document.getElementById('st').textContent =
      s.done ? `done — ${{s.samples}}/${{s.total}} spp`
             : `rendering… ${{s.samples}}/${{s.total}} spp`;
    if (!s.done)
      document.getElementById('im').src = '/preview.png?' + Date.now();
    if (s.accel) {{
      document.getElementById('acd').style.display = 'block';
      document.getElementById('acs').textContent =
        `${{s.accel.level}} #${{s.accel.index}} ` +
        `tris [${{s.accel.tri_rows}}] depth ${{s.accel.depth}}`;
    }}
  }});
}}, 1000);
document.addEventListener('keydown', e => {{
  const k = {{ArrowUp:'up', ArrowLeft:'left', ArrowRight:'right'}}[e.key];
  if (!k) return;
  e.preventDefault();
  ctl({{accel:k}}).then(() =>
    document.getElementById('ac').src = '/accel.png?' + Date.now());
}});
</script></body></html>"""


class PreviewServer:
    """Serve `png_path` + progress + a control channel on `port`
    (0 = ephemeral)."""

    def __init__(self, png_path: str, port: int = 8000, accel=None):
        self.png_path = png_path
        self.status = {"samples": 0, "total": 0, "done": False}
        # written by POST /control, polled by Renderer.render(control=...)
        self.control: dict = {}
        # optional interactive accel walk (utils/accel_walk.AccelWalk)
        self.accel = accel
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):          # quiet
                pass

            def _reply(self, body, ctype):
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path.split("?")[0] != "/control":
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self.send_response(400)
                    self.end_headers()
                    return
                if req.get("action") == "stop":
                    outer.control["stop"] = True
                for key in ("spp_cap", "preview_every"):
                    if isinstance(req.get(key), (int, float)) \
                            and req[key] > 0:
                        outer.control[key] = int(req[key])
                moved = False
                if outer.accel is not None and req.get("accel") in (
                        "up", "left", "right"):
                    moved = outer.accel.key(req["accel"])
                self._reply(json.dumps(
                    {"ok": True, "control": outer.control,
                     "moved": moved}).encode(),
                    "application/json")

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif path == "/preview.png":
                    try:
                        with open(outer.png_path, "rb") as f:
                            body = f.read()
                    except OSError:
                        self.send_response(404)
                        self.end_headers()
                        return
                    ctype = "image/png"
                elif path == "/status.json":
                    st = dict(outer.status)
                    if outer.accel is not None:
                        st["accel"] = outer.accel.status()
                    body = json.dumps(st).encode()
                    ctype = "application/json"
                elif path == "/accel.png" and outer.accel is not None:
                    body = outer._accel_png()
                    ctype = "image/png"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self._reply(body, ctype)

        self._httpd = http.server.ThreadingHTTPServer(
            ("0.0.0.0", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    def _accel_png(self) -> bytes:
        """Rasterize the current accel-walk selection over the latest
        preview frame (black if no preview yet)."""
        import os
        import tempfile

        import numpy as np

        from rrt_tpu.io.png import read_png, write_png
        base = None
        try:
            b = read_png(self.png_path).astype(np.float32) / 255.0
            base = b[..., :3] * 0.4          # dim, like the GL depth pass
        except Exception:  # noqa: BLE001 — no preview yet
            pass
        img = self.accel.render(base)
        rgba = np.concatenate(
            [np.clip(img * 255.0, 0, 255).astype(np.uint8),
             np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        fd, tmp = tempfile.mkstemp(suffix=".png")
        os.close(fd)
        try:
            write_png(tmp, rgba)
            with open(tmp, "rb") as f:
                return f.read()
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def start(self):
        self._thread.start()
        return self

    def update(self, samples: int, total: int, done: bool = False):
        self.status = {"samples": int(samples), "total": int(total),
                       "done": bool(done)}

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
