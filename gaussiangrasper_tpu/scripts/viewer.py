"""Interactive browser viewer for a trained run.

Role of the reference's viser-based viewer_beta (/root/reference/
nerfstudio/viewer_beta/viewer.py: websocket server + per-client render
thread + camera controls). Re-imagined with zero extra dependencies: a
small HTTP server serves an HTML page with mouse orbit/zoom controls that
POSTs camera poses to /render and receives JPEG frames rendered by the
jitted model. Supports rgb / depth / normal / feature-PCA view modes (the
control-panel output selector analog).

Usage: python -m gaussiangrasper_tpu.scripts.viewer --run-dir <run> [--port 7007]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>gaussiangrasper_tpu viewer</title><style>
body{margin:0;background:#111;color:#eee;font-family:sans-serif;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px;border-radius:6px}
img{width:100vw;height:100vh;object-fit:contain;display:block}
select{background:#222;color:#eee;border:1px solid #555}
</style></head><body>
<div id="hud">mode <select id="mode">
<option>rgb</option><option>depth</option><option>normal</option><option>feature</option>
</select> <span id="fps"></span><br>drag: orbit &middot; shift-drag: pan &middot; wheel: zoom</div>
<img id="view">
<script>
let az=0, el=0.5, dist=3.0, cx=0, cy=0, cz=0, busy=false, t0=0;
const img=document.getElementById('view'), fps=document.getElementById('fps');
function pose(){
  const ce=Math.cos(el), se=Math.sin(el), ca=Math.cos(az), sa=Math.sin(az);
  const eye=[cx+dist*ce*sa, cy+dist*ce*ca, cz+dist*se];
  return {eye:eye, center:[cx,cy,cz], up:[0,0,1]};
}
async function refresh(){
  if(busy) return; busy=true; t0=performance.now();
  const r=await fetch('/render',{method:'POST',body:JSON.stringify(
      {...pose(), mode:document.getElementById('mode').value})});
  const b=await r.blob();
  img.src=URL.createObjectURL(b);
  fps.textContent=(1000/(performance.now()-t0)).toFixed(1)+' fps';
  busy=false;
}
let drag=null;
window.addEventListener('mousedown',e=>drag=[e.clientX,e.clientY,e.shiftKey]);
window.addEventListener('mouseup',()=>drag=null);
window.addEventListener('mousemove',e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){cx-=dx*0.002*dist; cz+=dy*0.002*dist;}
  else {az+=dx*0.01; el=Math.min(1.5,Math.max(-1.5,el+dy*0.01));}
  drag=[e.clientX,e.clientY,drag[2]]; refresh();
});
window.addEventListener('wheel',e=>{dist*=Math.exp(e.deltaY*0.001); refresh();});
document.getElementById('mode').addEventListener('change',refresh);
refresh(); setInterval(()=>{if(!busy) refresh();}, 2000);
</script></body></html>"""


def look_at(eye, center, up):
    """OpenGL c2w (3, 4) from eye/center/up."""
    eye, center, up = (np.asarray(v, np.float32) for v in (eye, center, up))
    z = eye - center
    z = z / (np.linalg.norm(z) + 1e-9)  # OpenGL camera looks down -z
    x = np.cross(up, z)
    x = x / (np.linalg.norm(x) + 1e-9)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], axis=1).astype(np.float32)


def make_server(state_provider, model_cfg, port: int, width: int, height: int):
    """HTTP viewer server over a live state source.

    state_provider() -> TrainState; called per frame, so a running trainer
    can hand out its latest state (the reference's train-while-view loop,
    viewer_beta/viewer.py:367-406 — here lock-free: a stale/donated state
    mid-step just retries with the fresh one).
    """
    from PIL import Image

    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.model import feature_pca_vis, render as render_fn

    w, h = width, height
    f = 0.7 * w
    render_jit = jax.jit(
        lambda fl, a, c, s: render_fn(fl, a, c, s, model_cfg)
    )
    lock = threading.Lock()

    def render_pose(eye, center, up, mode):
        cam = Camera.create(f, f, w / 2, h / 2, look_at(eye, center, up), w, h)
        for _ in range(3):  # retry if the state was donated mid-render
            state = state_provider()
            try:
                with lock:
                    outs = render_jit(state.field, state.alive, cam, state.step)
                    if mode == "depth":
                        d = np.asarray(outs["depth"][..., 0])
                        d = (d - d.min()) / (d.max() - d.min() + 1e-8)
                        rgb = np.stack([d] * 3, -1)
                    elif mode == "normal":
                        rgb = np.asarray(outs["normal_vis"])
                    elif mode == "feature":
                        rgb = np.asarray(feature_pca_vis(outs["feature"]))
                    else:
                        rgb = np.asarray(jnp.clip(outs["rgb"], 0, 1))
                break
            except RuntimeError:
                continue
        else:
            rgb = np.zeros((h, w, 3), np.float32)
        buf = io.BytesIO()
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=85
        )
        return buf.getvalue()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            jpeg = render_pose(req["eye"], req["center"], req["up"],
                               req.get("mode", "rgb"))
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.end_headers()
            self.wfile.write(jpeg)

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def serve_in_background(state_provider, model_cfg, port: int,
                        width: int = 320, height: int = 240):
    """Start the viewer on a daemon thread (used by `ggt-train --viewer-port`)."""
    server = make_server(state_provider, model_cfg, port, width, height)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"live viewer on http://localhost:{port}", flush=True)
    return server


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Browser viewer for a trained run")
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    args = p.parse_args(argv)

    from gaussiangrasper_tpu.scripts.common import load_run

    config, trainer, state = load_run(args.run_dir)
    server = make_server(
        lambda: state, config.model, args.port, args.width, args.height
    )
    print(f"viewer on http://localhost:{args.port} "
          f"({int(jnp.sum(state.alive))} gaussians)")
    server.serve_forever()


if __name__ == "__main__":
    main()
