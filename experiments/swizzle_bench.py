"""Measure pixel-block swizzle vs raster ray order (orbit protocol)."""
import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"

scene = Scene.load(SCENE)
cfg = ComputeConfig()
handler = get_handler("pbvh")
arrays = scene.pack()
accel, arrays = handler.build(scene, arrays)


@partial(jax.jit, static_argnames=("width", "height", "block"))
def frame(camera_pos, camera_at, *, width, height, block):
    intersect = handler.intersect_fn(accel, arrays, cfg)
    return shade.render(
        arrays, intersect, cfg, camera_pos, camera_at, width, height,
        block=block,
    )


def orbit_bench(width, height, block, frames, rotations=1.0):
    cam = scene.camera
    out = frame(
        jnp.asarray(cam.pos, jnp.float32), jnp.asarray(cam.at, jnp.float32),
        width=width, height=height, block=block,
    )
    device_sync(out)
    mult = rotations * 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    for _ in range(frames):
        out = frame(
            jnp.asarray(cam.pos, jnp.float32),
            jnp.asarray(cam.at, jnp.float32),
            width=width, height=height, block=block,
        )
        cam = cam.orbited(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


# Correctness spot-check at an awkward (non-dividing) size first.
f0 = frame(
    jnp.asarray(scene.camera.pos, jnp.float32),
    jnp.asarray(scene.camera.at, jnp.float32),
    width=101, height=67, block=None,
)
for blk in [(8, 16), (16, 8)]:
    f1 = frame(
        jnp.asarray(scene.camera.pos, jnp.float32),
        jnp.asarray(scene.camera.at, jnp.float32),
        width=101, height=67, block=blk,
    )
    same = np.array_equal(np.asarray(f0), np.asarray(f1))
    print(f"bit-identical {blk}: {same}", flush=True)
    assert same

for width, height, frames in [(384, 288, 60), (1920, 1080, 12)]:
    for blk in [None, (8, 16), (16, 8), (4, 32)]:
        ms = orbit_bench(width, height, blk, frames)
        print(f"{width}x{height} block={blk}: {ms:.1f} ms/frame", flush=True)
