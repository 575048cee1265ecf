"""`--serve`: watch a render in a browser — the headless analog of the
reference's interactive progressive display (`CGL/src/viewer.cpp:142-170`
GLFW loop + `PathTracer::update_screen` glDrawPixels blit,
`pathtracer.cpp:156-178`).

A tiny stdlib HTTP server runs in a daemon thread and serves:
  /             an auto-refreshing page showing the progressive preview
  /preview.png  the current preview PNG bytes (no-cache)
  /status.json  {"samples": n, "total": m, "done": bool}

The renderer keeps writing its progressive preview PNG between passes
(`Renderer.render(preview_path=...)`); the page re-fetches it every
second, which is exactly the viewer's frame-loop blit cadence for a
long-running render.
"""
from __future__ import annotations

import http.server
import json
import os
import threading


_PAGE = """<!doctype html>
<html><head><title>rrt_tpu render</title><style>
body {{ background:#111; color:#ccc; font-family:monospace;
        text-align:center; }}
img {{ image-rendering:pixelated; max-width:95vw; max-height:85vh;
       border:1px solid #444; margin-top:1em; }}
</style></head><body>
<div id="st">rendering…</div>
<img id="im" src="/preview.png">
<script>
setInterval(() => {{
  fetch('/status.json').then(r => r.json()).then(s => {{
    document.getElementById('st').textContent =
      s.done ? `done — ${{s.samples}}/${{s.total}} spp`
             : `rendering… ${{s.samples}}/${{s.total}} spp`;
    if (!s.done)
      document.getElementById('im').src = '/preview.png?' + Date.now();
  }});
}}, 1000);
</script></body></html>"""


class PreviewServer:
    """Serve `png_path` + progress on `port` (0 = ephemeral)."""

    def __init__(self, png_path: str, port: int = 8000):
        self.png_path = png_path
        self.status = {"samples": 0, "total": 0, "done": False}
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):          # quiet
                pass

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
                    body = json.dumps(outer.status).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(
            ("0.0.0.0", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def update(self, samples: int, total: int, done: bool = False):
        self.status = {"samples": int(samples), "total": int(total),
                       "done": bool(done)}

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
