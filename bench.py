"""Headline benchmark: teatime full-fidelity frames on one chip.

Reproduces the reference study's protocol — the teatime scene (3,200-tri
teapot), 384x288, 4 bounces, 2 shadow-rayed lights, frames averaged over
a camera orbit (pdf p.19 §4.2) — on the Pallas packet-BVH backend, and
also reports 1080p numbers.

Baseline: the reference's best handler (RfBvhIntrs) at 214.569 ms per
compute pass on the same protocol (RX 580; BASELINE.md), i.e.
0.515 Mrays/s of primary-equivalent throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

SCENE = "/root/reference/scenes/teatime.json"
REF_FRAME_MS = 214.569  # RF-BVH, 384x288, 4 bounces (pdf p.19 §4.2.2)


from rt_rs_tpu.utils.sync import device_sync as _sync  # noqa: E402


def bench_frames(width: int, height: int, frames: int, rotations=1.0):
    """Mean seconds/frame over `frames` spread across `rotations` full
    camera orbits (the study averages over whole rotations, pdf §4.2).
    Single sync at the end — per-frame host syncs would measure the
    tunnel RTT, not compute."""
    import math

    r = Renderer(
        Scene.load(SCENE),
        config=Config(resolution=Resolution.sized(width, height)),
        handler="pbvh",
    )
    _sync(r.render_frame(block=False))  # compile + warm
    mult = rotations * 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = r.render_frame(block=False)
        r.orbit(mult)
    _sync(out)
    return (time.perf_counter() - t0) / frames


def bench_lbvh_build() -> float:
    """On-device LBVH build of cessna (~3.8K tris) -> ms (the
    BASELINE.json 'LBVH build ms (cessna)' metric)."""
    import jax

    from rt_rs_tpu.handlers.lbvh import build_accel_device
    from rt_rs_tpu.scene.obj import load_obj

    scene = Scene.empty()
    scene.add_mesh(load_obj("/root/reference/meshes/cessna.obj"), 0)
    scene.mat_color = np.array([[0.5, 0.1, 0.1]], np.float32)
    scene.mat_albedo = np.array([[0.9, 0.1, 0.0]], np.float32)
    scene.mat_spec = np.array([10.0], np.float32)
    arrays = scene.pack()
    f = jax.jit(build_accel_device)
    chunks, _ = f(arrays)
    _sync(chunks.bmin)
    t0 = time.perf_counter()
    for _ in range(20):
        chunks, _ = f(arrays)
    _sync(chunks.bmin)
    return (time.perf_counter() - t0) / 20 * 1e3


def main() -> None:
    ms_384 = bench_frames(384, 288, frames=60) * 1e3
    ms_1080 = bench_frames(1920, 1080, frames=12) * 1e3
    lbvh_ms = bench_lbvh_build()

    result = {
        "metric": (
            "teatime 384x288 4-bounce frame time "
            f"(1080p: {ms_1080:.1f} ms, {1920*1080/(ms_1080*1e-3)/1e6:.1f} "
            f"Mrays/s primary-equiv; cessna on-device LBVH build "
            f"{lbvh_ms:.2f} ms)"
        ),
        "value": round(ms_384, 3),
        "unit": "ms/frame",
        # >1 means faster than the reference's best handler on the same
        # protocol (RF-BVH, 214.569 ms on RX 580).
        "vs_baseline": round(REF_FRAME_MS / ms_384, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
