"""A/B: Renderer(seg_order="auto") vs build order on segmented scenes.

The counting study (experiments/seg_order_ab.py) showed camera
front-to-back segment order cuts chained list entries 22% on the 50K
canyon at the side-on view (and that build order there is exactly
back-to-front); this measures real orbit-averaged frame times through
the production Renderer.  The auto mode snaps the camera direction to
26 bins, so one warm-up orbit pre-compiles every order the timed
orbits will use (first-use XLA glue recompiles are a session cost,
not a per-frame one; the Mosaic kernels are shared across orders).

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/seg_order_frame_ab.py
"""

import sys

import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.utils.sync import device_sync

sys.path.insert(0, "/root/repo/experiments")
from measure_round3 import big_scene, orbit  # noqa: E402

W, H = 640, 480
REPS = 3
FRAMES = 24


def run(name, make_scene):
    rs = {}
    for key, kw in (
        ("scene", {}),
        ("auto", {"seg_order": "auto"}),
    ):
        rs[key] = Renderer(
            make_scene(),
            config=Config(resolution=Resolution.sized(W, H)),
            handler="pbvh",
            **kw,
        )
    n_orders = None
    for key, r in rs.items():
        device_sync(r.render_frame(block=False))
        orbit(r, FRAMES)  # warm-up orbit: compile every snapped order
        if key == "auto":
            n_orders = len(r._order_handlers)
    samples = {k: [] for k in rs}
    for _ in range(REPS):
        for k, r in rs.items():
            samples[k].append(orbit(r, FRAMES))
    for k, v in samples.items():
        print(
            f"{name} seg_order={k}: "
            + " ".join(f"{x:.2f}" for x in v)
            + f"  (median {np.median(v):.2f} ms)"
        )
    print(f"{name}: auto used {n_orders} distinct orders over the orbit")


def main():
    run("canyon seg 640x480", big_scene)
    from rt_rs_tpu.scene import presets

    run("teapots3 seg 640x480", lambda: presets.tiled_teapots(3))


if __name__ == "__main__":
    main()
