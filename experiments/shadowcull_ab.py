"""A/B the zero-contribution shadow cull on real TPU.

Interleaved repeats (tunnel warmup distorts single-shots — PERF.md).

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/shadowcull_ab.py [part]
"""
import sys

import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import big_scene, orbit, static_ms  # noqa: F401

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"


def pair(w, h, scene=None, frames=60):
    rs = {
        cull: Renderer(
            scene or Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler="pbvh", shadow_cull=cull,
        )
        for cull in (False, True)
    }
    # Output equality check first (compiled TPU, same camera).
    a = np.asarray(rs[False].render_frame())
    b = np.asarray(rs[True].render_frame())
    print(f"{w}x{h} max |cull - nocull| = {np.abs(a - b).max():.2e}")
    for rep in range(2):
        for cull, r in rs.items():
            print(f"{w}x{h} shadow_cull={cull}: {orbit(r, frames):.2f} ms",
                  flush=True)


if PART in ("all", "small"):
    pair(384, 288)

if PART in ("all", "1080"):
    pair(1920, 1080, frames=12)

if PART in ("all", "seg"):
    pair(640, 480, scene=big_scene(), frames=16)
