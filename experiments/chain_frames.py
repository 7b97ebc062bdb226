"""Chain K frames inside ONE jitted graph (VERDICT r3 #9).

The blank-frame decomposition (PERF.md round 3) showed ~1.3 ms/frame
of host dispatch through the axon tunnel on top of 0.69 ms of device
ops — an environment floor for the 1-dispatch-per-frame loop.  This
experiment advances the orbit camera IN-GRAPH (the jnp twin of
CameraUniform.orbited, camera.rs:177-189) and renders K frames per
dispatch, so the host cost amortizes K-fold.  Frames are packed to u8
in-graph and ALL returned (returning only the last would let XLA
dead-code-eliminate the rest — frames are independent given cameras).

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/chain_frames.py [part]
part: all | small | 1080 | blank
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer, _render_jit
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.camera import ORBIT_RATE
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"


def orbit_jnp(pos, at, mult=1.0):
    x = pos[0] - at[0]
    z = pos[2] - at[2]
    theta = jnp.arctan2(z, x) + ORBIT_RATE * mult
    r = jnp.sqrt(x * x + z * z)
    return jnp.stack(
        [at[0] + r * jnp.cos(theta), pos[1], at[2] + r * jnp.sin(theta)]
    )


def make_chained(r: Renderer, k: int):
    kw = dict(
        handler=r.handler, cfg=r.config.compute, width=r.width,
        height=r.height, block=r.block, force_rows=r.force_rows,
        fuse_bounce=r.fuse_bounce, shadow_cull=r.shadow_cull,
        retile=False,
    )

    @partial(jax.jit, static_argnames=())
    def chained(arrays, accel, pos, at):
        frames = []
        for _ in range(k):
            f = _render_jit(arrays, accel, pos, at, **kw)
            frames.append(
                jnp.round(jnp.clip(f, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            )
            pos = orbit_jnp(pos, at)
        return jnp.stack(frames), pos

    return chained


def bench_chained(r: Renderer, k: int, total_frames: int) -> float:
    fn = make_chained(r, k)
    pos = jnp.asarray(r.camera.pos, jnp.float32)
    at = jnp.asarray(r.camera.at, jnp.float32)
    frames, pos = fn(r.arrays, r.accel, pos, at)  # compile + warm
    device_sync(pos)
    t0 = time.perf_counter()
    last = None
    for _ in range(total_frames // k):
        last, pos = fn(r.arrays, r.accel, pos, at)
    device_sync(pos)
    ms = (time.perf_counter() - t0) / total_frames * 1e3
    assert last is not None and np.asarray(last).shape[0] == k
    return ms


def bench_loop(r: Renderer, total_frames: int) -> float:
    r.render_frame(block=True)  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(total_frames):
        out = r.render_frame(block=False)
        r.orbit(1.0)
    device_sync(out)
    return (time.perf_counter() - t0) / total_frames * 1e3


CASES = {
    "small": ("pbvh", 384, 288, 64),
    "1080": ("pbvh", 1920, 1080, 12),
    "blank": ("blank", 384, 288, 64),
}

if __name__ == "__main__":
    for name, (handler, w, h, frames) in CASES.items():
        if PART not in ("all", name):
            continue
        r = Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler=handler,
        )
        for rep in range(3):
            line = [f"{name} {w}x{h} loop: {bench_loop(r, frames):.2f}"]
            for k in (4, 16):
                if frames % k:
                    continue
                line.append(f"k={k}: {bench_chained(r, k, frames):.2f}")
            print("  ".join(line) + " ms/frame", flush=True)
