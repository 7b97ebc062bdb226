"""Dynamic (per-frame rebuild/refit) teatime at 1080p: tc x rows sweep.

The dynamic small-frame optimum is tc=32 (PERF.md round 3), but at
tc=32 the with-attrs VMEM cap is 6,144 tris — teatime (6,320) can't
take the rows path, so the >=400K-pixel rows heuristic is moot at the
current default.  This measures whether large dynamic frames should
prefer tc=64 (rows eligible) instead.  Interleaved A/B, 1%-wobble
orbit, one sync per run.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/dynamic_1080.py
"""

import math
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"
W, H = 1920, 1080
FRAMES = 12


def bench(dyn, vp, vn):
    out = dyn.render_frame(vp, vn, block=False)
    device_sync(out)
    mult = 2.0 * math.pi / FRAMES / 0.0314
    t0 = time.perf_counter()
    for i in range(FRAMES):
        wob = vp * (1.0 + 0.01 * math.sin(i * 0.3))
        out = dyn.render_frame(wob, vn, block=False)
        dyn.camera = dyn.camera.orbited(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / FRAMES * 1e3


def main():
    scene = Scene.load(SCENE)
    cfg = Config(resolution=Resolution.sized(W, H))
    vp = jnp.asarray(scene.vert_pos, jnp.float32)
    vn = jnp.asarray(scene.vert_norm, jnp.float32)

    configs = [
        ("tc=32 gather (current default)", dict(tri_chunk=32)),
        ("tc=64 gather", dict(tri_chunk=64, force_rows=False)),
        ("tc=64 rows", dict(tri_chunk=64, force_rows=True)),
    ]
    dyns = {
        name: DynamicRenderer(
            Scene.load(SCENE), config=cfg, refit=True, **kw
        )
        for name, kw in configs
    }
    # Interleaved repeats (trust no single-shot numbers on the tunnel).
    results = {name: [] for name, _ in configs}
    for _ in range(3):
        for name, _ in configs:
            results[name].append(bench(dyns[name], vp, vn))
    print(f"dynamic teatime refit {W}x{H}, {FRAMES}-frame wobble orbit:")
    for name, vals in results.items():
        print(f"  {name:32s} " + " ".join(f"{v:7.1f}" for v in vals))


if __name__ == "__main__":
    main()
