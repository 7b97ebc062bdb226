"""Per-call decomposition of the tiled 1080p frame (rows path).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/tiled_call_profile.py
"""
import time

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
    h = get_handler("pbvh")
    accel, arr2 = h.build(scene, scene.pack())
    tiso = h.intersect_tiled_fn(accel, arr2, cfg)
    riso = h.intersect_tiled_rows_fn(accel, arr2, cfg)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    # Record every intersect call of one frame.
    calls = []  # (kind, payload, valid, cap)

    def rec_t(payload, valid, t_cap=None):
        calls.append(("shadow", payload, valid, t_cap))
        return tiso(payload, valid, t_cap=t_cap)

    def rec_r(payload, valid, t_cap=None):
        calls.append(("rows", payload, valid, t_cap))
        return riso(payload, valid, t_cap=t_cap)

    payload, valid, n0 = shade.camera_ray_tiles(
        pos, at, W, H, 256, block=(16, 16)
    )
    _ = shade.trace_tiled(
        arr2, rec_t, cfg, payload, valid, pos, intersect_rows_fn=rec_r
    )

    full = jax.jit(
        lambda p_, a_: shade.render_tiled(
            arr2, tiso, cfg, p_, a_, W, H, ray_tile=256, block=(16, 16),
            intersect_rows_fn=riso,
        )
    )
    print(f"full frame: {timed(full, pos, at):.1f} ms "
          f"({len(calls)} intersect calls)")

    total = 0.0
    for i, (kind, pay, val, cap) in enumerate(calls):
        fn = riso if kind == "rows" else tiso
        jfn = jax.jit(lambda p, v, c, fn=fn: fn(p, v, t_cap=c))
        ms = timed(jfn, pay, val, cap)
        live = int(np.asarray(jnp.sum(val)))
        print(f"call {i} {kind:>6}: {pay.shape[1]*pay.shape[2]:>8} rays "
              f"({live:>8} live): {ms:6.1f} ms")
        total += ms
    print(f"sum of isolated calls: {total:.1f} ms")


if __name__ == "__main__":
    main()
