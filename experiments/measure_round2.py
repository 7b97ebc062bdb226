"""Post-tune TPU measurements: flagship, streaming, dynamic."""
import math
import time

import numpy as np
import jax.numpy as jnp

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer, Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"


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


# 1. flagship via Renderer defaults (auto block, rt=256)
for (w, h, f) in [(384, 288, 60), (1920, 1080, 12)]:
    r = Renderer(
        Scene.load(SCENE),
        config=Config(resolution=Resolution.sized(w, h)),
        handler="pbvh",
    )
    print(f"flagship {w}x{h} block={r.block}: {orbit(r, f):.1f} ms", flush=True)

# 2. streaming: 8 teapots (~50K tris) @640x480
base = Scene.load(SCENE)
n = base.prim_indices.shape[0]
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
print(f"big scene: {big.prim_indices.shape[0]} tris", flush=True)
r = Renderer(
    big, config=Config(resolution=Resolution.sized(640, 480)),
    handler="pbvh",
)
print(f"streaming 640x480 block={r.block}: {orbit(r, 20):.1f} ms", flush=True)

# 3. dynamic: teatime 384x288, rebuild and refit
scene = Scene.load(SCENE)
for refit in (False, True):
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

# isolate streaming: static camera + old knobs
def static_ms(r, frames=20):
    out = r.render_frame(block=False)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(block=False)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3

for kw, blk in [({}, "auto"), ({"ray_tile": 128}, (8, 16)),
                ({"ray_tile": 128}, None)]:
    r = Renderer(
        big, config=Config(resolution=Resolution.sized(640, 480)),
        handler="pbvh", handler_kwargs=kw,
        block=blk if blk != "auto" else "auto",
    )
    print(f"streaming static kw={kw} block={r.block}: {static_ms(r):.1f} ms",
          flush=True)
