"""Live streaming dashboard — the samnagui equivalent for a TPU host.

The reference opens a samna GUI during streaming with three elements: an
80x80 DVS activity plot, a 5-rail power measurement plot, and the readout of
match results (reference lens/src/speck2f.py:28-75, fed by
run_speck.py:277-311).  A TPU host has no samna, so the same layout is served
as a self-contained web dashboard from the streaming loop:

  GET /        -> single-page HTML (activity canvas + power chart + match log)
  GET /state   -> JSON snapshot: current bin, activity frame (base64 PNG),
                  rolling per-rail power history (mW), recent matches,
                  output-spike totals

`run_event_driven` starts it automatically unless --headless is set
(making the reference's headless flag actually gate something); the port is
ephemeral by default, override with LENS_VIZ_PORT.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from lens_tpu.runtime.power import RAILS

_PAGE = """<!DOCTYPE html>
<html><head><title>LENS-TPU live</title><style>
body{font-family:monospace;background:#111;color:#ddd;margin:20px}
.row{display:flex;gap:24px;align-items:flex-start}
canvas{image-rendering:pixelated;border:1px solid #444}
h3{margin:6px 0;color:#8cf}
#log{max-height:320px;overflow-y:auto;font-size:12px}
#log div{padding:1px 0;border-bottom:1px solid #222}
svg{border:1px solid #444;background:#181818}
.legend span{margin-right:12px;font-size:12px}
</style></head><body>
<h2>LENS-TPU streaming &mdash; live view</h2>
<div id=stats></div>
<div class=row>
 <div><h3>DVS activity</h3><canvas id=act width=320 height=320></canvas></div>
 <div><h3>Power (mW, modeled)</h3><svg id=pw width=460 height=320></svg>
  <div class=legend id=leg></div></div>
 <div><h3>Place matches</h3><div id=log></div></div>
</div>
<script>
const COLORS=['#8cf','#fa6','#6f6','#f6f','#ff6'];
async function tick(){
 try{
  const s=await (await fetch('/state')).json();
  document.getElementById('stats').textContent=
   `bin ${s.bin}  |  output spikes (bin): ${s.bin_spikes}  |  total: ${s.total_spikes}`;
  if(s.frame_png){
   const img=new Image();
   img.onload=()=>{const c=document.getElementById('act').getContext('2d');
    c.imageSmoothingEnabled=false;c.drawImage(img,0,0,320,320);};
   img.src='data:image/png;base64,'+s.frame_png;
  }
  const svg=document.getElementById('pw');
  const rails=Object.entries(s.rails_mw);
  let max=1e-6;
  rails.forEach(([_,v])=>v.forEach(x=>{if(x>max)max=x;}));
  svg.innerHTML=rails.map(([name,v],i)=>{
   const pts=v.map((x,j)=>`${j/(Math.max(v.length-1,1))*450+5},${315-x/max*300}`).join(' ');
   return `<polyline fill="none" stroke="${COLORS[i]}" points="${pts}"/>`;
  }).join('');
  document.getElementById('leg').innerHTML=rails.map(([n,_],i)=>
   `<span style="color:${COLORS[i]}">&#9632; ${n}</span>`).join('');
  const log=document.getElementById('log');
  log.innerHTML=s.matches.map((m,i)=>
   `<div>seq ${s.match_base+i}: place ${m}</div>`).reverse().join('');
 }catch(e){}
 setTimeout(tick,250);
}
tick();
</script></body></html>"""


class LiveDashboard:
    """Thread-safe state holder + HTTP server for the live streaming view."""

    def __init__(self, history: int = 200, match_window: int = 50):
        self._lock = threading.Lock()
        self._frame: Optional[np.ndarray] = None  # raw; encoded lazily
        self._frame_png: Optional[str] = None  # cache, keyed by _png_bin
        self._png_bin = -1
        self._rails = {r: deque(maxlen=history) for r in RAILS}
        self._matches: deque = deque(maxlen=match_window)
        self._match_count = 0
        self._bin = -1
        self._bin_spikes = 0
        self._total_spikes = 0
        self._server: Optional[ThreadingHTTPServer] = None
        self.url: Optional[str] = None

    # -- producers (streaming loop) ----------------------------------------
    def update_bin(
        self,
        bin_idx: int,
        frame: np.ndarray,
        out_spikes: int,
        rails_w: dict,
    ) -> None:
        # Store the raw frame only; PNG encoding happens lazily in state()
        # so the streaming hot loop pays nothing when no browser is polling.
        with self._lock:
            self._bin = bin_idx
            self._frame = np.array(frame)  # copy: encoded lazily, caller may reuse
            self._bin_spikes = int(out_spikes)
            self._total_spikes += int(out_spikes)
            for r in RAILS:
                self._rails[r].append(float(rails_w.get(r, 0.0)) * 1e3)

    def add_matches(self, matches) -> None:
        with self._lock:
            for m in matches:
                self._matches.append(int(m))
                self._match_count += 1

    @staticmethod
    def _encode_frame(frame: np.ndarray) -> str:
        from PIL import Image

        f = np.asarray(frame, np.float64)
        peak = f.max() or 1.0
        img = Image.fromarray((f / peak * 255.0).astype(np.uint8), "L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    # -- consumers (HTTP) ---------------------------------------------------
    def state(self) -> dict:
        # Snapshot under the lock; encode OUTSIDE it — PNG compression takes
        # milliseconds and would block the streaming loop's update_bin on
        # every first /state poll of a bin.
        with self._lock:
            frame = self._frame
            frame_bin = self._bin
            encode = frame is not None and self._png_bin != frame_bin
        if encode:
            png = self._encode_frame(frame)
            with self._lock:
                # A newer bin may have landed meanwhile; only publish if ours
                # is still the freshest encodable state.
                if self._png_bin != self._bin and frame_bin == self._bin:
                    self._frame_png = png
                    self._png_bin = frame_bin
        with self._lock:
            return {
                "bin": self._bin,
                "bin_spikes": self._bin_spikes,
                "total_spikes": self._total_spikes,
                "frame_png": self._frame_png,
                "rails_mw": {r: list(v) for r, v in self._rails.items()},
                "matches": list(self._matches),
                "match_base": self._match_count - len(self._matches),
            }

    def start(self, port: int = 0, bind: str = "127.0.0.1") -> str:
        dash = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _send(self, code, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/":
                    self._send(200, _PAGE.encode(), "text/html")
                elif self.path == "/state":
                    self._send(
                        200, json.dumps(dash.state()).encode(), "application/json"
                    )
                else:
                    self._send(404, b'{"error":"unknown path"}', "application/json")

        self._server = ThreadingHTTPServer((bind, port), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        self.url = f"http://{bind}:{self._server.server_address[1]}/"
        return self.url

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
