"""A/B ray_tile=128 vs 256 at 1080p (round 4).

The round-3 sweep pinned ray_tile=256 at 384x288 only; the roofline's
per-call data (constant us/entry proportional to lattice width, entry
counts set by per-tile ray unions) predicts narrower tiles win where
tiles are divergent — which is the 1080p secondary/shadow calls.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/rt128_ab.py [part]
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import orbit

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"

SIZES = {
    "small": (384, 288, 60),
    "mid": (640, 480, 30),
    "1080": (1920, 1080, 12),
}

for name, (w, h, frames) in SIZES.items():
    if PART not in ("all", name):
        continue
    rs = {
        rt: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler="pbvh", handler_kwargs={"ray_tile": rt},
        )
        for rt in (256, 128)
    }
    for rep in range(3):
        for rt, r in rs.items():
            print(f"{w}x{h} rt={rt}: {orbit(r, frames):.2f} ms", flush=True)
