#!/usr/bin/env python
"""Interactive scene viewer — the ns-viewer / Viser equivalent (SURVEY.md §2b
row ns-viewer): loads a trained checkpoint and serves a browser-based orbit
viewer over HTTP; frames are rendered server-side by the model on demand
(drag to orbit, wheel to zoom, sliders for exposure / rolling shutter to
preview the motion-compensation model on novel views).

Usage: python cli/viewer.py --load-config <run>/config.json [--port 7007]
"""
import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>splat_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px; border-radius:6px; }
img { width:100vw; height:100vh; object-fit:contain; display:block; }
label { display:block; margin-top:4px; }
</style></head><body>
<img id="view" draggable="false">
<div id="hud">
  <div>drag: orbit &middot; wheel: zoom</div>
  <label>exposure <input id="exp" type="range" min="0" max="0.5" step="0.01" value="0"></label>
  <label>rolling shutter <input id="rs" type="range" min="0" max="0.1" step="0.005" value="0"></label>
  <details><summary>crop box</summary>
    <label>x <input id="cx0" class="crop" type="range" min="0" max="1" step="0.02" value="0">
           <input id="cx1" class="crop" type="range" min="0" max="1" step="0.02" value="1"></label>
    <label>y <input id="cy0" class="crop" type="range" min="0" max="1" step="0.02" value="0">
           <input id="cy1" class="crop" type="range" min="0" max="1" step="0.02" value="1"></label>
    <label>z <input id="cz0" class="crop" type="range" min="0" max="1" step="0.02" value="0">
           <input id="cz1" class="crop" type="range" min="0" max="1" step="0.02" value="1"></label>
  </details>
  <div><a id="plylink" href="/export.ply" download style="color:#8cf">download .ply (3DGS, cropped)</a></div>
  <div id="stat"></div>
</div>
<script>
let yaw=0.6, pitch=0.4, radius=2.5, drag=null, busy=false, dirty=true;
const img=document.getElementById('view');
function refresh(){
  if(busy){dirty=true;return;}
  busy=true;dirty=false;
  const t0=performance.now();
  const exp=document.getElementById('exp').value, rs=document.getElementById('rs').value;
  const crop=['cx0','cx1','cy0','cy1','cz0','cz1'].map(i=>`${i}=${document.getElementById(i).value}`).join('&');
  document.getElementById('plylink').href=`/export.ply?${crop}`;
  fetch(`/render?yaw=${yaw}&pitch=${pitch}&r=${radius}&exp=${exp}&rs=${rs}&${crop}`)
   .then(r=>r.blob()).then(b=>{
     img.src=URL.createObjectURL(b);
     document.getElementById('stat').textContent=`${(performance.now()-t0).toFixed(0)} ms`;
     busy=false; if(dirty) refresh();
   }).catch(()=>{busy=false;});
}
img.addEventListener('mousedown',e=>{drag=[e.clientX,e.clientY];});
window.addEventListener('mouseup',()=>{drag=null;});
window.addEventListener('mousemove',e=>{
  if(!drag) return;
  yaw += (e.clientX-drag[0])*0.01; pitch += (e.clientY-drag[1])*0.01;
  pitch=Math.max(-1.4,Math.min(1.4,pitch)); drag=[e.clientX,e.clientY]; refresh();
});
window.addEventListener('wheel',e=>{radius*=Math.exp(e.deltaY*0.001);refresh();});
document.getElementById('exp').addEventListener('input',refresh);
document.getElementById('rs').addEventListener('input',refresh);
for(const el of document.querySelectorAll('.crop')) el.addEventListener('input',refresh);
refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, config_path: Path, res: int):
        from render_model import load_trainer_from_config

        cfg, trainer = load_trainer_from_config(config_path)
        self._init(cfg, trainer, res)

    @classmethod
    def from_trainer(cls, cfg, trainer, res: int) -> "ViewerState":
        """Live-training viewer (ns-train --vis viewer equivalent): renders
        read trainer.params at request time, so the view tracks training —
        params pytrees are swapped atomically by the host loop and JAX arrays
        are immutable, so no trainer-side locking is needed."""
        self = cls.__new__(cls)
        self._init(cfg, trainer, res)
        return self

    def _init(self, cfg, trainer, res: int):
        self.cfg = cfg
        self.trainer = trainer
        self.res = res
        self.lock = threading.Lock()
        self._render_cache = {}
        # orbit target: scene centroid of alive gaussians
        g = self.trainer.params.gaussians
        alive = np.asarray(g.alive) > 0.5
        means = np.asarray(g.means)[alive]
        self.center = means.mean(axis=0)
        # robust scene AABB for the crop-box sliders (fractions -> world)
        self.aabb_lo = np.percentile(means, 1, axis=0)
        self.aabb_hi = np.percentile(means, 99, axis=0)

    def crop_to_world(self, crop):
        """(x0,x1,y0,y1,z0,z1) AABB fractions -> (lo, hi) world coords."""
        f = np.asarray(crop, np.float32).reshape(3, 2)
        span = self.aabb_hi - self.aabb_lo
        return self.aabb_lo + f[:, 0] * span, self.aabb_lo + f[:, 1] * span

    def render(self, yaw, pitch, radius, exposure, rs_time, crop=None) -> bytes:
        import dataclasses

        import jax.numpy as jnp
        from PIL import Image

        from splat_tpu.cameras import paths as pth
        from splat_tpu.cameras.cameras import Cameras
        from splat_tpu.models import splatfacto as sf

        pos = self.center + radius * np.array(
            [np.cos(pitch) * np.cos(yaw), np.cos(pitch) * np.sin(yaw), np.sin(pitch)]
        )
        c2w_gl = pth.look_at(pos, self.center)
        R_cv, p = Cameras.gl_to_cv_c2w(jnp.asarray(c2w_gl[None], jnp.float32))
        res = self.res
        fl = res * 1.0
        # tangential orbit motion for blur/RS preview
        vel = np.array([1.0, 0.0, 0.0]) * (0.5 if exposure > 0 or rs_time > 0 else 0.0)
        cam = Cameras(
            R_cv, p,
            *(jnp.full((1,), v) for v in (fl, fl, res / 2, res / 2)),
            res, res,
            lin_vel=jnp.asarray(vel[None], jnp.float32),
            ang_vel=jnp.zeros((1, 3)),
            exposure_time=jnp.full((1,), exposure),
            rolling_shutter_time=jnp.full((1,), rs_time),
            cam_idx=jnp.zeros((1,), jnp.int32),
        )
        mcfg = dataclasses.replace(
            self.cfg.model,
            blur_samples=5 if exposure > 0 else 0,
            rolling_shutter_compensation=True,
        )
        params = self.trainer.params._replace(camera_opt={}, velocity_opt={})
        if crop is not None and tuple(crop) != (0.0, 1.0, 0.0, 1.0, 0.0, 1.0):
            lo, hi = self.crop_to_world(crop)
            g = params.gaussians
            inside = jnp.all(
                (g.means >= jnp.asarray(lo)) & (g.means <= jnp.asarray(hi)),
                axis=1,
            )
            params = params._replace(
                gaussians=g._replace(alive=g.alive * inside.astype(g.alive.dtype))
            )
        # sh degree must be resolved OUTSIDE the jit (int() on a staged value
        # raises ConcretizationTypeError under omnistaging)
        sh_deg = int(sf.active_sh_degree(mcfg, self.trainer.step))
        with self.lock:
            key = (mcfg.blur_samples, sh_deg)
            if key not in self._render_cache:
                import jax

                def _render(params, cam, cfg=mcfg, deg=sh_deg):
                    bg = sf.background_color(params, cfg)
                    out = sf.render_camera(params, cam, cfg, deg, bg)
                    return sf.gamma_encode(out.rgb, cfg)

                self._render_cache[key] = jax.jit(_render)
            img = np.clip(np.asarray(self._render_cache[key](params, cam)), 0, 1)
        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(buf, "PNG")
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/render":
                q = parse_qs(url.query)
                get = lambda k, d: float(q.get(k, [d])[0])
                try:
                    png = state.render(
                        get("yaw", 0), get("pitch", 0.3), get("r", 2.5),
                        get("exp", 0), get("rs", 0),
                        crop=(get("cx0", 0), get("cx1", 1), get("cy0", 0),
                              get("cy1", 1), get("cz0", 0), get("cz1", 1)),
                    )
                except Exception as e:  # surface render errors to the client
                    msg = str(e).encode()
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/export.ply":
                # ns-export gaussian-splat equivalent, live from the current
                # params (works mid-training); optional crop/min-opacity via
                # ?xmin=..&xmax=..&...&minop=..
                import io
                import tempfile

                import jax

                import export as export_cli

                q = parse_qs(url.query)
                g = state.trainer.params.gaussians
                keep = np.asarray(g.alive) > 0
                minop = float(q.get("minop", [0])[0])
                if minop > 0:
                    keep &= np.asarray(jax.nn.sigmoid(g.opacities_logit)) >= minop
                means = np.asarray(g.means)
                axes = ("x", "y", "z")
                if all(f"{a}{m}" in q for a in axes for m in ("min", "max")):
                    lo = np.array([float(q[f"{a}min"][0]) for a in axes])
                    hi = np.array([float(q[f"{a}max"][0]) for a in axes])
                    keep &= np.all((means >= lo) & (means <= hi), axis=1)
                elif any(k in q for k in
                         ("cx0", "cx1", "cy0", "cy1", "cz0", "cz1")):
                    # viewer crop-box sliders: AABB fractions
                    getf = lambda k, d: float(q.get(k, [d])[0])
                    lo, hi = state.crop_to_world((
                        getf("cx0", 0), getf("cx1", 1), getf("cy0", 0),
                        getf("cy1", 1), getf("cz0", 0), getf("cz1", 1),
                    ))
                    keep &= np.all((means >= lo) & (means <= hi), axis=1)
                with tempfile.NamedTemporaryFile(suffix=".ply") as f:
                    export_cli.export_ply(
                        f.name, means[keep],
                        np.asarray(g.scales_log)[keep],
                        np.asarray(g.quats)[keep],
                        np.asarray(g.opacities_logit)[keep],
                        np.asarray(g.features_dc)[keep],
                        np.asarray(g.features_rest)[keep],
                    )
                    body = Path(f.name).read_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--port", type=int, default=7007)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--resolution", type=int, default=256)
    args = ap.parse_args(argv)

    from splat_tpu.utils.env import respect_jax_platforms_env

    respect_jax_platforms_env()
    state = ViewerState(Path(args.load_config), args.resolution)
    serve(state, args.host, args.port, block=True)


def serve(state: ViewerState, host: str = "0.0.0.0", port: int = 7007,
          block: bool = False):
    """Start the viewer HTTP server; block=False runs it on a daemon thread
    (used by cli/fit.py --vis viewer for live-training viewing)."""
    server = ThreadingHTTPServer((host, port), make_handler(state))
    print(f"viewer at http://{host}:{port}/")
    if block:
        server.serve_forever()
        return server
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


if __name__ == "__main__":
    main()
