"""A/B kernel-emitted rows on the DynamicRenderer path at small sizes.

The round-3 re-sweep flipped the STATIC resident-table default to rows
at every size, but the dynamic path pays a PER-FRAME attr-table build
for rows — unmeasured below the old 400K-pixel threshold.  Sweep
force_rows x refit at 384x288 and 640x480 (both below 400K, i.e. both
currently on the gather path) under the wobble-orbit protocol.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/dynamic_rows_ab.py
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
    for w, h in ((384, 288), (640, 480)):
        cfg = Config(resolution=Resolution.sized(w, h))
        rs = {
            (refit, rows): DynamicRenderer(
                scene, config=cfg, refit=refit, force_rows=rows
            )
            for refit in (False, True)
            for rows in (False, True)
        }
        for rep in range(2):
            for (refit, rows), r in rs.items():
                print(
                    f"dynamic {w}x{h} refit={refit} rows={rows}: "
                    f"{wobble_orbit(r, scene):.1f} ms",
                    flush=True,
                )


if __name__ == "__main__":
    main()
