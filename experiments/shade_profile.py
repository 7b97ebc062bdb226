"""Ablate the shade path at 1080p (cached intersect results) to find
what dominates the 162 ms shade-only time (see frame_profile.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/shade_profile.py
"""
import time
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

W, H = 1920, 1080
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    scene = Scene.load("/root/reference/scenes/teatime.json")
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    isect = handler.intersect_fn(accel, arrays, cfg)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    o, d = shade.camera_rays(pos, at, W, H, block=(16, 16))
    cached = []

    def recording_isect(o_, d_, excl_, valid_, t_cap=None):
        t, pid = isect(o_, d_, excl_, valid_, t_cap=t_cap)
        cached.append((jnp.asarray(t), jnp.asarray(pid)))
        return t, pid

    _ = shade.trace(arrays, recording_isect, cfg, o, d)

    def make_replay():
        state = {"i": 0}

        def replay(o_, d_, excl_, valid_, t_cap=None):
            t, pid = cached[state["i"]]
            state["i"] += 1
            return t, pid

        return replay

    def shade_only(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        c = shade.trace(arrays, make_replay(), cfg, o_, d_)
        return shade.unblock_colors(c, W, H, (16, 16))

    print(f"baseline shade-only: {timed(jax.jit(shade_only), pos, at):.1f} ms")

    # 0. camera rays + unblock alone
    def rays_only(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        return shade.unblock_colors(o_ + d_, W, H, (16, 16))

    print(f"camera_rays+unblock: {timed(jax.jit(rays_only), pos, at):.1f} ms")

    # 1. no pow
    orig_power = jnp.power
    with mock.patch.object(jnp, "power", lambda x, y: x * y):
        print(f"pow -> mul:          {timed(jax.jit(shade_only), pos, at):.1f} ms")

    # 2. pid=0 everywhere: the [N,32] row gather becomes a broadcast of
    # row 0 (hits keep their t, so the arithmetic still runs).
    import dataclasses as dc

    def shade_zeropid(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        state = {"i": 0}

        def rz(o__, d__, excl__, valid__, t_cap=None):
            t, pid = cached[state["i"]]
            state["i"] += 1
            return t, jnp.zeros_like(pid)

        c = shade.trace(arrays, rz, cfg, o_, d_)
        return shade.unblock_colors(c, W, H, (16, 16))

    print(f"pid=0 (cheap gather): {timed(jax.jit(shade_zeropid), pos, at):.1f} ms")

    # 3. single light instead of two
    arrays1l = dc.replace(
        arrays,
        light_pos=arrays.light_pos[:1],
        light_strength=arrays.light_strength[:1],
    )

    def shade_1light(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        c = shade.trace(arrays1l, make_replay(), cfg, o_, d_)
        return shade.unblock_colors(c, W, H, (16, 16))

    print(f"1 light:             {timed(jax.jit(shade_1light), pos, at):.1f} ms")

    # 4. bounces=1 (one loop iteration, still full lights)
    cfg1 = dc.replace(cfg, bounces=1)

    def shade_1bounce(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        c = shade.trace(arrays, make_replay(), cfg1, o_, d_)
        return shade.unblock_colors(c, W, H, (16, 16))

    print(f"bounces=1:           {timed(jax.jit(shade_1bounce), pos, at):.1f} ms")


if __name__ == "__main__":
    main()
