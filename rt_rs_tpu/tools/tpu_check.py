"""Compiled-kernel verification on the current backend (run on TPU).

The CPU test suite exercises Pallas only in interpret mode; this tool
re-renders the golden scenes with every accelerated handler through the
real Mosaic-compiled kernels and diffs against ``tests/goldens`` (the
verify-skill recipe, scripted), then cross-checks the >=400K-pixel
rows/any-hit path against the gather path at 1024x512.

Usage:  python -m rt_rs_tpu.tools.tpu_check
Exit code 0 = all checks passed.
"""

from __future__ import annotations

import sys

import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.image import read_png

SCENES = "/root/reference/scenes"
GOLDENS = "tests/goldens"
HANDLERS = ("naive", "bvh", "rf_bvh", "pbvh")


def main() -> int:
    ok = True
    for name in ("default", "teatime"):
        golden = read_png(f"{GOLDENS}/{name}_64x48.png").astype(int)
        for handler in HANDLERS:
            r = Renderer(
                Scene.load(f"{SCENES}/{name}.json"),
                config=Config(resolution=Resolution.sized(64, 48)),
                handler=handler,
            )
            img = r.render_image().astype(int)
            diff = np.abs(img - golden)
            good = diff.max() <= 2 and (diff > 0).mean() < 0.02
            ok &= good
            print(
                f"{name:>8} {handler:>7}: max {diff.max()} "
                f"({(diff > 0).mean():.2%} px)  "
                f"{'PASS' if good else 'FAIL'}",
                flush=True,
            )

    # Rows/any-hit path (>= 400K pixels) vs the gather path: the same
    # scene at two sizes straddling the threshold must agree after
    # downsampling is irrelevant — instead render one size both ways.
    import jax.numpy as jnp

    from rt_rs_tpu.config import ComputeConfig
    from rt_rs_tpu.handlers import get_handler
    from rt_rs_tpu.ops import shade

    scene = Scene.load(f"{SCENES}/teatime.json")
    cfg = ComputeConfig()
    h = get_handler("pbvh")
    accel, arr2 = h.build(scene, scene.pack())
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)
    kw = dict(ray_tile=256, block=(16, 16))
    gather = np.asarray(
        shade.render_tiled(
            arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg,
            pos, at, 1024, 512, **kw,
        )
    )
    rows = np.asarray(
        shade.render_tiled(
            arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg,
            pos, at, 1024, 512, **kw,
            intersect_rows_fn=h.intersect_tiled_rows_fn(accel, arr2, cfg),
            intersect_anyhit_fn=h.intersect_tiled_anyhit_fn(
                accel, arr2, cfg
            ),
        )
    )
    d = np.abs(rows - gather).max()
    good = d <= 1e-5
    ok &= good
    print(
        f"rows+anyhit vs gather @1024x512: max diff {d:.2e}  "
        f"{'PASS' if good else 'FAIL'}",
        flush=True,
    )
    print("ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
