"""A/B the between-bounce live-tile compaction (retile) on real TPU.

Interleaved repeats (tunnel warmup distorts single-shots — PERF.md).

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/retile_ab.py [part]
part: all | small | mid | 1080 | seg
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import big_scene, orbit, static_ms  # noqa: F401

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
        mode: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler="pbvh", retile=mode,
        )
        for mode in (False, True)
    }
    for rep in range(3):
        for mode, r in rs.items():
            print(f"{w}x{h} retile={mode}: {orbit(r, frames):.2f} ms",
                  flush=True)

if PART in ("all", "seg"):
    big = big_scene()
    rs = {
        mode: Renderer(
            big,
            config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", retile=mode,
        )
        for mode in (False, True)
    }
    for rep in range(3):
        for mode, r in rs.items():
            print(
                f"seg 640x480 retile={mode}: "
                f"static {static_ms(lambda: r.render_frame(block=False)):.1f}"
                f" orbit {orbit(r, 16):.1f} ms",
                flush=True,
            )
