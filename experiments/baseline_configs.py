"""Measure every BASELINE.json config on the real TPU.

The five configs (BASELINE.json "configs") each get an orbit-protocol
number (chained frames, one device sync — utils.sync.device_sync; the
study averages over whole rotations, pdf §4.2):

1. default.json @ 512x512 (pbvh)
2. teatime + precomputed teatime.bvh.json @ 1080p (bvh checkpoint
   loader — the reference's `load --handler-bvh <path>` config — plus
   pbvh for comparison)
3. dodecahedron + magnolia with on-device LBVH build (lbvh handler,
   384x288) + the one-time build cost
4. shuttle + cessna combined (~7K tris) multi-bounce @ 640x480 (pbvh)
5. animated teapot, per-frame refit (DynamicRenderer) @ 384x288 —
   reports the implied FPS vs the 30 FPS stretch goal

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/baseline_configs.py
"""

from __future__ import annotations

import math
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer, Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.camera import CameraController, CameraUniform
from rt_rs_tpu.scene.obj import load_obj
from rt_rs_tpu.utils.sync import device_sync

SCENES = "/root/reference/scenes"
MESHES = "/root/reference/meshes"


def orbit_ms(r: Renderer, frames: int, rotations: float = 1.0) -> float:
    device_sync(r.render_frame(block=False))  # compile + warm
    mult = rotations * 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    out = None
    for _ in range(frames):
        out = r.render_frame(block=False)
        r.orbit(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


def mesh_scene(name, campos, offset=None, extra=None):
    scene = Scene.empty(
        camera=CameraUniform(campos, (0.0, 0.0, 0.0)),
        camera_controller=CameraController("Orbit"),
    )
    scene.mat_color = np.array([[0.5, 0.1, 0.1]], dtype=np.float32)
    scene.mat_albedo = np.array([[0.9, 0.1, 0.3]], dtype=np.float32)
    scene.mat_spec = np.array([10.0], dtype=np.float32)
    scene.light_pos = np.array(
        [[30.0, 40.0, -20.0], [-25.0, 30.0, 25.0]], dtype=np.float32
    )
    scene.light_strength = np.array([1.6, 1.2], dtype=np.float32)
    for mesh_name, off in [(name, offset)] + (extra or []):
        mesh = load_obj(f"{MESHES}/{mesh_name}.obj")
        if off is not None:
            mesh.positions = mesh.positions + np.asarray(off, np.float64)
        scene.add_mesh(mesh, 0)
    return scene


def main() -> None:
    out = {}

    # 1. default scene, 512x512
    r = Renderer(
        Scene.load(f"{SCENES}/default.json"),
        config=Config(resolution=Resolution.sized(512, 512)),
        handler="pbvh",
    )
    out["1 default 512x512 pbvh"] = orbit_ms(r, 60)

    # 2. teatime @1080p from the precomputed checkpoint (bvh handler,
    #    packet backend) and the from-scratch pbvh build.
    cfg1080 = Config(resolution=Resolution.sized(1920, 1080))
    r = Renderer(
        Scene.load(f"{SCENES}/teatime.json"),
        config=cfg1080,
        handler="bvh",
        handler_kwargs={"path": f"{SCENES}/teatime.bvh.json"},
    )
    out["2 teatime 1080p bvh(checkpoint)"] = orbit_ms(r, 12)
    r = Renderer(
        Scene.load(f"{SCENES}/teatime.json"), config=cfg1080, handler="pbvh"
    )
    out["2 teatime 1080p pbvh"] = orbit_ms(r, 12)

    # 3. dodecahedron + magnolia, on-device LBVH (no precomputed BVH).
    cfg384 = Config(
        compute=ComputeConfig(bounces=4),
        resolution=Resolution.sized(384, 288),
    )
    for name, campos in [
        ("dodecahedron", (0.0, 0.0, -6.0)),
        ("magnolia", (0.0, 0.0, -180.0)),
    ]:
        scene = mesh_scene(name, campos)
        t0 = time.perf_counter()
        r = Renderer(scene, config=cfg384, handler="lbvh")
        build_s = time.perf_counter() - t0
        out[f"3 {name} 384x288 lbvh"] = orbit_ms(r, 60)
        out[f"3 {name} build (host wall)"] = build_s * 1e3

    # 4. shuttle + cessna combined, multi-bounce.
    # Mesh bounds: shuttle ~15 units wide, cessna ~44 — side by side
    # they span x in [-33, 37]; the ~53 deg pinhole at distance 75
    # frames both (measured 27% lit pixels at 48x32).
    scene = mesh_scene(
        "shuttle", (0.0, 25.0, -75.0), offset=(-25.0, 0.0, 0.0),
        extra=[("cessna", (15.0, 0.0, 0.0))],
    )
    print(f"shuttle+cessna prims: {scene.num_prims}")
    r = Renderer(
        scene,
        config=Config(
            compute=ComputeConfig(bounces=4),
            resolution=Resolution.sized(640, 480),
        ),
        handler="pbvh",
    )
    out["4 shuttle+cessna 640x480 pbvh b4"] = orbit_ms(r, 40)

    # 5. animated teapot, per-frame refit.
    scene = Scene.load(f"{SCENES}/teatime.json")
    dyn = DynamicRenderer(
        scene,
        config=Config(resolution=Resolution.sized(384, 288)),
        refit=True,
    )
    vp = jnp.asarray(scene.vert_pos, jnp.float32)
    vn = jnp.asarray(scene.vert_norm, jnp.float32)
    dyn.render_frame(vp, vn, block=True)  # compile + warm
    frames = 60
    mult = 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    o = None
    for i in range(frames):
        wob = vp * (1.0 + 0.01 * math.sin(i * 0.3))  # 1% breathing wobble
        o = dyn.render_frame(wob, vn, block=False)
        dyn.camera = dyn.camera.orbited(mult)
    device_sync(o)
    ms = (time.perf_counter() - t0) / frames * 1e3
    out["5 animated teapot refit 384x288"] = ms
    out["5 implied FPS"] = 1e3 / ms

    print("\n== BASELINE.json config measurements ==")
    for k, v in out.items():
        print(f"{k:42s} {v:8.2f} {'fps' if 'FPS' in k else 'ms'}")


if __name__ == "__main__":
    main()
