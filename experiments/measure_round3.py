"""Round-3 TPU measurements: fused bounce kernel, lbvh handler,
dynamic paths, segmented rows/any-hit.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_round3.py [part]
part: all | fuse | blank | lbvh | dynamic | seg
"""
import math
import sys
import time

import numpy as np
import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer, Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"
# Measurement blocks only run as a script (this module is
# imported by other experiments for big_scene/static_ms).
RUN = __name__ == "__main__"


def orbit(r, frames, rotations=1.0):
    out = r.render_frame(block=False)
    device_sync(out)
    mult = rotations * 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(block=False)
        r.orbit(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


def static_ms(render_once, frames=20):
    out = render_once()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = render_once()
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


def big_scene():
    base = Scene.load(SCENE)
    nv = base.vert_pos.shape[0]
    offsets = [
        (dx * 9.0, dy * 7.0, dz * 9.0)
        for dx in (-1, 1) for dy in (0, 1) for dz in (-1, 1)
    ]
    big = Scene.empty()
    big.camera = base.camera
    big.light_pos = base.light_pos
    big.light_strength = base.light_strength
    big.mat_color = base.mat_color
    big.mat_albedo = base.mat_albedo
    big.mat_spec = base.mat_spec
    vp, vn, pi, pm = [], [], [], []
    for i, (dx, dy, dz) in enumerate(offsets):
        vp.append(base.vert_pos + np.array([dx, dy, dz], np.float32))
        vn.append(base.vert_norm)
        pi.append(base.prim_indices + i * nv)
        pm.append(base.prim_material)
    big.vert_pos = np.concatenate(vp)
    big.vert_norm = np.concatenate(vn)
    big.prim_indices = np.concatenate(pi)
    big.prim_material = np.concatenate(pm)
    return big


# 1. fused bounce kernel A/B on the flagship (+ blank overhead probe).
if RUN and PART in ("all", "blank"):
    for fuse in (False, True):
        rb = Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler="blank", fuse_bounce=fuse,
        )
        print(f"blank 384x288 fuse={fuse}: {orbit(rb, 60):.2f} ms",
              flush=True)
if RUN and PART in ("all", "fuse"):
    for fuse in (False, True):
        for (w, h, f) in [(384, 288, 60), (1920, 1080, 12)]:
            r = Renderer(
                Scene.load(SCENE),
                config=Config(resolution=Resolution.sized(w, h)),
                handler="pbvh", fuse_bounce=fuse,
            )
            print(
                f"flagship {w}x{h} fuse={fuse}: {orbit(r, f):.1f} ms",
                flush=True,
            )

# 2. lbvh handler (now tuned) vs pbvh, teatime orbit.
if RUN and PART in ("all", "lbvh"):
    for handler in ("lbvh", "pbvh"):
        r = Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler=handler,
        )
        print(f"{handler} 384x288: {orbit(r, 60):.1f} ms", flush=True)
    # cessna on-device build time comparison is in bench.py already.

# 3. dynamic rebuild / refit (tuned chunks now).
if RUN and PART in ("all", "dynamic", "dynamic0", "dynamic1"):
    scene = Scene.load(SCENE)
    modes = {
        "dynamic0": (False,), "dynamic1": (True,),
    }.get(PART, (False, True))
    for refit in modes:
        dr = DynamicRenderer(
            scene, config=Config(resolution=Resolution.sized(384, 288)),
            refit=refit,
        )
        vp = jnp.asarray(scene.vert_pos, jnp.float32)
        vn = jnp.asarray(scene.vert_norm, jnp.float32)
        out = dr.render_frame(vp, vn, block=False)
        device_sync(out)
        frames = 40
        t0 = time.perf_counter()
        for i in range(frames):
            wob = vp * (1.0 + 0.01 * math.sin(i * 0.3))
            out = dr.render_frame(wob, vn, block=False)
            dr.camera = dr.camera.orbited(2.0 * math.pi / frames / 0.0314)
        device_sync(out)
        ms = (time.perf_counter() - t0) / frames * 1e3
        print(f"dynamic refit={refit}: {ms:.1f} ms", flush=True)

# 4. segmented 50K-tri scene: gather vs rows/any-hit fast path.
if RUN and PART in ("all", "seg"):
    big = big_scene()
    print(f"big scene: {big.prim_indices.shape[0]} tris", flush=True)
    for force_rows in (False, True):
        r = Renderer(
            big, config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", force_rows=force_rows,
        )
        ms = static_ms(lambda: r.render_frame(block=False))
        print(f"seg 640x480 static force_rows={force_rows}: {ms:.1f} ms",
              flush=True)
        ms = orbit(r, 20)
        print(f"seg 640x480 orbit force_rows={force_rows}: {ms:.1f} ms",
              flush=True)
