"""Re-sweep tri_chunk x ray_tile under the tiled shading regime
(round 2b): the kernel is now a larger share of the frame, so the
looseness-vs-overhead balance may have shifted.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/retune_tiled.py
"""
import math
import time

import jax.numpy as jnp
from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"


def orbit_ms(r, frames):
    out = r.render_frame(block=False)
    device_sync(out)
    mult = 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(block=False)
        r.orbit(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


if __name__ == "__main__":
    for tc, rt in ((64, 256), (32, 256), (128, 256), (64, 128),
                   (64, 512), (32, 128)):
        blk_w = 16 if rt % 16 == 0 else 8
        blk = (rt // blk_w, blk_w)
        line = f"tc={tc} rt={rt} blk={blk}:"
        for (w, h, frames) in ((384, 288, 40), (1920, 1080, 14)):
            r = Renderer(
                Scene.load(SCENE),
                config=Config(resolution=Resolution.sized(w, h)),
                handler="pbvh",
                handler_kwargs=dict(tri_chunk=tc, ray_tile=rt),
                block=blk,
            )
            line += f"  {w}x{h} {orbit_ms(r, frames):.2f} ms"
        print(line, flush=True)
