"""Where does the 1080p full-fidelity frame go?  Times each intersect
call shape of the bounce loop in isolation (same ray populations as a
real frame: trace one frame, capture the secondary ray batches, then
re-run each batch standalone), plus the shade-only arithmetic.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/frame_profile.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.pallas.packet_trace import TUNED_RAY_TILE
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
    return (time.perf_counter() - t0) / REPS * 1e3, out


def main():
    scene = Scene.load("/root/reference/scenes/teatime.json")
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    isect = handler.intersect_fn(accel, arrays, cfg)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    # Instrument trace() by replaying it and capturing per-call batches.
    o, d = shade.camera_rays(pos, at, W, H, block=(16, 16))
    n = o.shape[0]
    batches = []  # (label, o, d, excl, valid, cap)

    def recording_isect(o_, d_, excl_, valid_, t_cap=None):
        batches.append((o_, d_, excl_, valid_, t_cap))
        return isect(o_, d_, excl_, valid_, t_cap=t_cap)

    _ = shade.trace(arrays, recording_isect, cfg, o, d)

    full = jax.jit(
        lambda p_, a_: shade.render(
            arrays, isect, cfg, p_, a_, W, H, block=(16, 16)
        )
    )
    ms_full, _ = timed(full, pos, at)
    print(f"full frame: {ms_full:.1f} ms ({len(batches)} intersect calls)")

    jisect = jax.jit(partial(isect))
    total = 0.0
    for i, (bo, bd, bex, bva, bcap) in enumerate(batches):
        bo, bd, bex, bva = map(jnp.asarray, (bo, bd, bex, bva))
        args = (bo, bd, bex, bva)
        if bcap is None:
            ms, _ = timed(lambda *a: jisect(*a), *args)
        else:
            ms, _ = timed(
                lambda *a: jisect(*a[:4], t_cap=a[4]), *args, jnp.asarray(bcap)
            )
        live = int(np.asarray(jnp.sum(bva)))
        print(
            f"call {i}: {bo.shape[0]:>8} rays ({live:>8} live): {ms:6.1f} ms"
        )
        total += ms

    # Shade-only: replace intersect with a no-op returning cached results.
    cached = [
        (jnp.asarray(t), jnp.asarray(pid))
        for (bo, bd, bex, bva, bcap) in batches
        for (t, pid) in [isect(bo, bd, bex, bva, t_cap=bcap)]
    ]

    def make_replay():
        it = iter(list(range(len(cached))))

        def replay_isect(o_, d_, excl_, valid_, t_cap=None):
            return cached[next(it)]

        return replay_isect

    def shade_only(p_, a_):
        o_, d_ = shade.camera_rays(p_, a_, W, H, block=(16, 16))
        c = shade.trace(arrays, make_replay(), cfg, o_, d_)
        return shade.unblock_colors(c, W, H, (16, 16))

    ms_shade, _ = timed(jax.jit(shade_only), pos, at)
    print(f"sum of isolated intersects: {total:.1f} ms")
    print(f"shade-only (cached hits):   {ms_shade:.1f} ms")


if __name__ == "__main__":
    main()
