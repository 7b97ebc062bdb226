"""A/B: front-to-back early exit (VERDICT round-4 task 2).

The last sized-but-untried kernel lever: per-tile chunk lists sorted
by conservative entry distance + an in-loop skip when the next entry's
bound exceeds the tile's running worst best-t
(``packet_closest_hit_tiled early_exit=``).  Round-4 sizing: best-case
<=22% of the primary call's blocks, ~0% elsewhere (tiles with any miss
ray never exit), expected net ~1-2 ms of the 1080p frame BEFORE the
in-loop reduction overhead.

Interleaved triples (the round-4 protocol — single-shot numbers drift
tens of percent across tunnel sessions), teatime orbit, pbvh defaults;
also the segmented canyon where chained caps give the exit bound a
head start.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/early_exit_ab.py [sizes]
sizes: small | mid | 1080 | seg | all (default all)
"""

import math
import sys
import time

import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

sys.path.insert(0, "/root/repo/experiments")
from measure_round3 import big_scene, orbit  # noqa: E402

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"
REPS = 3


def run(name, scene, w, h, frames):
    cfg = Config(resolution=Resolution.sized(w, h))
    rs = {
        "off": Renderer(scene, config=cfg, handler="pbvh"),
        "on": Renderer(
            scene, config=cfg, handler="pbvh",
            handler_kwargs={"early_exit": True},
        ),
    }
    # compile + warm both before timing
    for r in rs.values():
        device_sync(r.render_frame(block=False))
    samples = {k: [] for k in rs}
    for _ in range(REPS):
        for k, r in rs.items():
            samples[k].append(orbit(r, frames))
    for k, v in samples.items():
        print(
            f"{name} early_exit={k}: "
            + " ".join(f"{x:.2f}" for x in v)
            + f"  (median {np.median(v):.2f} ms)"
        )


def main():
    scene = Scene.load(SCENE)
    if PART in ("all", "small"):
        run("teatime 384x288", scene, 384, 288, 60)
    if PART in ("all", "mid"):
        run("teatime 640x480", scene, 640, 480, 30)
    if PART in ("all", "1080"):
        run("teatime 1080p", scene, 1920, 1080, 12)
    if PART in ("all", "seg"):
        run("canyon seg 640x480", big_scene(), 640, 480, 10)


if __name__ == "__main__":
    main()
