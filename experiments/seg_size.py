"""Segment-size sweep for beyond-VMEM scenes: how big can a resident
segment go before Mosaic VMEM-OOMs, and does fewer/bigger segments
beat the 12K-tri default?

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/seg_size.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.pallas.packet_trace import (
    build_tri_chunks,
    packet_closest_hit_segmented_tiled,
    split_chunks,
)
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync


def big_scene():
    base = Scene.load("/root/reference/scenes/teatime.json")
    nv = base.vert_pos.shape[0]
    offsets = [(dx * 9.0, dy * 7.0, dz * 9.0)
               for dx in (-1, 1) for dy in (0, 1) for dz in (-1, 1)]
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


if __name__ == "__main__":
    cfg = ComputeConfig()
    scene = big_scene()
    h = get_handler("pbvh")  # for the leaf reorder
    arrays = scene.pack()
    _, arrays = h.build(scene, arrays)
    chunks = build_tri_chunks(
        arrays.pa, arrays.pb, arrays.pc, max_chunks=None, tri_chunk=64
    )
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)

    for seg_tris in (12288, 24576, 49152):
        try:
            seg = split_chunks(chunks, max_seg_tris=seg_tris)
            isect = partial(
                packet_closest_hit_segmented_tiled, seg,
                t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps,
            )
            f = jax.jit(lambda p, a: shade.render_tiled(
                arrays, isect, cfg, p, a, 640, 480,
                ray_tile=256, block=(16, 16)))
            out = f(pos, at)
            device_sync(out)
            t0 = time.perf_counter()
            for _ in range(15):
                out = f(pos, at)
            device_sync(out)
            ms = (time.perf_counter() - t0) / 15 * 1e3
            print(f"seg={seg_tris} tris ({len(seg.segments)} segments): "
                  f"{ms:.1f} ms/frame", flush=True)
        except Exception as e:
            print(f"seg={seg_tris}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
