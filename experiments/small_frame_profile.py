"""Decompose the 384x288 teatime frame (the study-protocol flagship,
currently ~8.5 ms): blank floor, per-intersect-call isolated cost,
and per-call culled list-length stats — is the small frame kernel-
math-bound, per-step-overhead-bound, or launch-bound?

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/small_frame_profile.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

W, H = 384, 288
REPS = 40


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
    # Side-on view (the orbit average is dominated by these).
    scene.camera = scene.camera.orbited(25.0)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    for handler in ("blank", "pbvh"):
        r = Renderer(
            scene, config=Config(resolution=Resolution.sized(W, H)),
            handler=handler,
        )
        r.camera = scene.camera
        print(f"{handler} frame: {timed(lambda: r.render_frame(block=False)):.2f} ms",
              flush=True)

    h = get_handler("pbvh")
    accel, arr2 = h.build(scene, scene.pack())
    tiso = h.intersect_tiled_fn(accel, arr2, cfg)

    calls = []

    def rec_t(payload, valid, t_cap=None):
        calls.append((payload, valid, t_cap))
        return tiso(payload, valid, t_cap=t_cap)

    payload, valid, _ = shade.camera_ray_tiles(
        pos, at, W, H, 256, block=(16, 16)
    )
    _ = shade.trace_tiled(arr2, rec_t, cfg, payload, valid, pos)

    from rt_rs_tpu.ops.pallas.packet_trace import chunk_overlap_mask_cm

    total = 0.0
    for i, (pay, val, cap) in enumerate(calls):
        jfn = jax.jit(lambda p, v, c: tiso(p, v, t_cap=c))
        ms = timed(jfn, pay, val, cap)
        live = int(np.asarray(jnp.sum(val)))
        ov = chunk_overlap_mask_cm(
            pay[0:3], 1.0 / pay[3:6], val, accel.bmin, accel.bmax,
            t_min=cfg.t_min, t_max=cfg.t_max, t_cap=cap,
        )
        counts = np.asarray(jnp.sum(ov, axis=1))
        livect = counts[counts > 0]
        print(
            f"call {i}: tiles {pay.shape[1]:>5} rays {pay.shape[1]*pay.shape[2]:>7}"
            f" live {live:>7}  iso {ms:5.2f} ms"
            f"  lists: nonzero {len(livect):>4}"
            f" mean {livect.mean() if len(livect) else 0:5.1f}"
            f" max {counts.max():3d} (of {accel.num_chunks})",
            flush=True,
        )
        total += ms
    print(f"sum of isolated intersect calls: {total:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
