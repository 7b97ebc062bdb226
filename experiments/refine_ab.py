"""A/B the per-ray cull refinement (refine=off/bounces/all) on real TPU.

Interleaved repeats (tunnel warmup distorts single-shots — PERF.md).

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/refine_ab.py [part]
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import big_scene, orbit, static_ms  # noqa: F401

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"

if PART in ("all", "small"):
    rs = {
        mode: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler="pbvh", handler_kwargs=dict(refine=mode),
        )
        for mode in ("off", "bounces", "all")
    }
    for rep in range(2):
        for mode, r in rs.items():
            print(f"384x288 refine={mode}: {orbit(r, 60):.2f} ms",
                  flush=True)

if PART in ("all", "1080"):
    rs = {
        mode: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(1920, 1080)),
            handler="pbvh", handler_kwargs=dict(refine=mode),
        )
        for mode in ("off", "bounces", "all")
    }
    for rep in range(2):
        for mode, r in rs.items():
            print(f"1080p refine={mode}: {orbit(r, 12):.1f} ms",
                  flush=True)

if PART in ("all", "seg"):
    big = big_scene()
    rs = {
        mode: Renderer(
            big,
            config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", handler_kwargs=dict(refine=mode),
        )
        for mode in ("off", "bounces", "all")
    }
    for rep in range(2):
        for mode, r in rs.items():
            print(
                f"seg 640x480 refine={mode}: "
                f"static {static_ms(lambda: r.render_frame(block=False)):.1f}"
                f" orbit {orbit(r, 16):.1f} ms",
                flush=True,
            )
