"""A/B the per-ray cull refinement on the DynamicRenderer path.

DynamicRenderer's kernel partial was never tagged supports_refine, so
dynamic frames ran round-2-style interval-only culling while static
frames got the round-3 per-ray refine (renderer.py fix).  Same
protocol as the round-3 dynamic sweep: teatime 384x288, 1%-wobble
orbit.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/dynamic_refine_ab.py
"""
import math
import time

import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"


def wobble_orbit(r, scene, frames=60):
    base = jnp.asarray(scene.vert_pos, jnp.float32)
    norm = jnp.asarray(scene.vert_norm, jnp.float32)
    device_sync(r.render_frame(base, norm, block=False))
    mult = 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    out = None
    for i in range(frames):
        amp = 0.01 * float(np.sin(i * 0.3))
        out = r.render_frame(base * (1.0 + amp), norm, block=False)
        r.camera = r.camera.orbited(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    scene = Scene.load(SCENE)
    cfg = Config(resolution=Resolution.sized(384, 288))
    rs = {
        (refit, refine): DynamicRenderer(
            scene, config=cfg, refit=refit, refine=refine
        )
        for refit in (False, True)
        for refine in (False, True)
    }
    for rep in range(2):
        for (refit, refine), r in rs.items():
            print(
                f"dynamic refit={refit} refine={refine}: "
                f"{wobble_orbit(r, scene):.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
