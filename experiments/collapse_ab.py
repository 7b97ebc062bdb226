"""A/B the dead-group block-copy collapse (packet_closest_hit_tiled
collapse=) and its composition with retile, on real TPU.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/collapse_ab.py [part]
part: all | small | 1080 | seg
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
import rt_rs_tpu.ops.pallas.packet_trace as pt
import rt_rs_tpu.handlers.pbvh as pb

from measure_round3 import big_scene, orbit, static_ms  # noqa: F401

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"

_orig = pt.packet_closest_hit_tiled
_collapse = {"on": True}


def _patched(*args, **kws):
    kws.setdefault("collapse", _collapse["on"])
    return _orig(*args, **kws)


pt.packet_closest_hit_tiled = _patched
pb.packet_closest_hit_tiled = _patched


def bench(name, w, h, frames, scene=None, **rkw):
    rs = {}
    for collapse in (False, True):
        for retile in (False, True):
            rs[(collapse, retile)] = Renderer(
                scene or Scene.load(SCENE),
                config=Config(resolution=Resolution.sized(w, h)),
                handler="pbvh", retile=retile, **rkw,
            )
    for rep in range(2):
        for (collapse, retile), r in rs.items():
            _collapse["on"] = collapse
            print(
                f"{name} collapse={collapse} retile={retile}: "
                f"{orbit(r, frames):.2f} ms",
                flush=True,
            )


if PART in ("all", "small"):
    bench("384x288", 384, 288, 60)
if PART in ("all", "1080"):
    bench("1080p", 1920, 1080, 12)
if PART in ("all", "seg"):
    bench("seg 640x480", 640, 480, 16, scene=big_scene())
