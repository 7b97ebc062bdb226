"""A/B the per-call laneways narrowing (trace_tiled narrow=128).

Unlike the global ray_tile=128 (LOST at every size — primaries double
their entries), narrow= splits only the secondary/shadow calls, where
the roofline showed entries are set by divergent 256-ray tile unions.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/narrow_ab.py [part]
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import big_scene, orbit

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
        nw: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler="pbvh", narrow=nw,
        )
        for nw in (None, 128)
    }
    for rep in range(3):
        for nw, r in rs.items():
            print(f"{w}x{h} narrow={nw}: {orbit(r, frames):.2f} ms",
                  flush=True)

if PART in ("all", "seg"):
    big = big_scene()
    rs = {
        nw: Renderer(
            big,
            config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", narrow=nw,
        )
        for nw in (None, 128)
    }
    for rep in range(3):
        for nw, r in rs.items():
            print(f"seg 640x480 narrow={nw}: {orbit(r, 16):.1f} ms",
                  flush=True)
