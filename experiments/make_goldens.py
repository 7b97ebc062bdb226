"""(Re)generate the 64x48 golden PNGs in tests/goldens.

Run on CPU (goldens pin the CPU image; TPU agreement is checked by
tools/tpu_check.py with a 1-count rounding tolerance):

    PYTHONPATH=/root/.axon_site:/root/repo python experiments/make_goldens.py

Every golden is rendered by the naive brute-force backend, which is
oracle-verified in tests/test_render.py — so these images carry the
reference's semantics (compute.wgsl transcription) by transitivity.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rt_rs_tpu.config import ComputeConfig, Config, Resolution  # noqa: E402
from rt_rs_tpu.renderer import Renderer  # noqa: E402
from rt_rs_tpu.scene import Scene  # noqa: E402
from rt_rs_tpu.scene import presets  # noqa: E402
from rt_rs_tpu.utils.image import write_png  # noqa: E402

W, H = 64, 48
OUT = "tests/goldens"

jobs = {
    name: (Scene.load(f"{presets.SCENES}/{name}.json"), 4)
    for name in ("default", "teatime")
}
jobs.update(presets.golden_set())

only = set(sys.argv[1:])
for name, (scene, bounces) in jobs.items():
    if only and name not in only:
        continue
    r = Renderer(
        scene,
        config=Config(
            compute=ComputeConfig(bounces=bounces),
            resolution=Resolution.sized(W, H),
        ),
        handler="naive",
    )
    img = r.render_image()
    assert img.any(), f"{name}: all-black golden (bad camera?)"
    path = f"{OUT}/{name}_{W}x{H}.png"
    write_png(path, np.asarray(img))
    print(f"{path}: mean {img.mean():.1f} nonzero {(img > 0).mean():.2%}",
          flush=True)
