"""Multi-chip scaling benchmark — runs when real chips are available.

This dev environment exposes ONE real TPU chip (the axon tunnel), so
the 2-D mesh story (image bands x scene shards, rt_rs_tpu/parallel) is
correctness-gated on the 8-device virtual CPU mesh and cannot be
wall-clock measured here.  On a real multi-chip host this script
measures the frame time of every mesh factorization of the available
chips, for both a resident scene (teatime) and a beyond-VMEM one
(tiled teapots), against the single-chip baseline.

Usage (on a pod slice):
    PYTHONPATH=... python experiments/multichip_bench.py [width height]
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.parallel import hybrid_mesh, image_mesh, make_sharded_render
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"


def factorizations(n: int):
    for bands in range(1, n + 1):
        if n % bands == 0:
            yield bands, n // bands


def bench(fn, pos, at, frames=30) -> float:
    frame, _ = fn(pos, at)
    device_sync(frame)
    t0 = time.perf_counter()
    for _ in range(frames):
        frame, _ = fn(pos, at)
    device_sync(frame)
    return (time.perf_counter() - t0) / frames * 1e3


def main() -> None:
    n = len(jax.devices())
    if n < 2 or jax.default_backend() != "tpu":
        print(
            f"SKIP: need >=2 real TPU devices, have {n} "
            f"({jax.default_backend()}); the 2-D mesh is CPU-mesh "
            "correctness-gated in tests/test_parallel.py"
        )
        return
    width, height = (
        (int(sys.argv[1]), int(sys.argv[2]))
        if len(sys.argv) > 2
        else (1920, 1080)
    )
    # Pad height to the LCM of band counts so every factorization runs.
    lcm = 1
    for bands, _ in factorizations(n):
        lcm = lcm * bands // math.gcd(lcm, bands)
    height = -(-height // lcm) * lcm

    scene = Scene.load(SCENE)
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    print(f"{n} devices, teatime {width}x{height} full fidelity")
    for bands, shards in factorizations(n):
        mesh = (
            image_mesh(n) if shards == 1 else hybrid_mesh(bands, shards)
        )
        fn = make_sharded_render(
            handler, accel, arrays, cfg, width, height, mesh
        )
        ms = bench(fn, pos, at)
        print(f"  bands={bands:3d} shards={shards:3d}: {ms:8.2f} ms/frame")


if __name__ == "__main__":
    main()
