"""LBVH backend: fully on-device build (TPU-native addition).

No reference counterpart — the reference always builds its BVH on the
CPU (``src/lib/bvh/aabb.rs``).  This backend sorts primitives by Morton
code and chunks them for the Pallas packet kernel entirely with device
ops, so acceleration "construction" is part of the jitted computation:

* static scenes: build once at handler setup (device);
* dynamic scenes: :func:`build_accel_device` is jit-traceable — call it
  inside the frame step with updated vertex positions for a true
  per-frame rebuild/refit (BASELINE.json "animated teapot" config; see
  ``tests/test_lbvh.py::test_dynamic_rebuild`` and
  ``rt_rs_tpu.renderer.DynamicRenderer``).

The sorted order plays the role of the reference's leaf-contiguous
reorder (``bvh.rs:103-110``); Morton-adjacent prims are spatially local
so the packet kernel's 8-triangle chunks stay tight.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers.base import IntrsHandler, IntrsStats
from rt_rs_tpu.ops.lbvh import morton_codes, morton_order
from rt_rs_tpu.ops.pallas.packet_trace import (
    CHUNK_ALIGN,
    LANES,
    MAX_VMEM_CHUNKS,
    TRI_CHUNK,
    TriChunks,
    packet_closest_hit,
)
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.arrays import SceneArrays


def device_chunks(pa: jax.Array, pb: jax.Array, pc: jax.Array) -> TriChunks:
    """jnp version of ``build_tri_chunks`` (jit-traceable).

    Inputs are the *reordered* per-prim corners including the null
    sentinel row 0 (excluded here, as in the host builder).
    """
    pa, pb, pc = pa[1:], pb[1:], pc[1:]
    p = pa.shape[0]
    nc = max(1, -(-p // TRI_CHUNK))
    nc = -(-nc // CHUNK_ALIGN) * CHUNK_ALIGN
    if nc > MAX_VMEM_CHUNKS:
        raise ValueError(
            f"{p} triangles -> {nc} chunks exceeds the packet kernel's "
            f"VMEM limit ({MAX_VMEM_CHUNKS}); use the 'bvh' handler"
        )
    pad = nc * TRI_CHUNK - p

    def padz(x):
        return jnp.pad(x, ((0, pad), (0, 0)))

    pa_, pb_, pc_ = padz(pa), padz(pb), padz(pc)
    e1 = pb_ - pa_
    e2 = pc_ - pa_
    comp9 = jnp.concatenate([pa_, e1, e2], axis=1)  # [P_pad, 9]
    comp = jnp.zeros((nc, TRI_CHUNK, LANES), dtype=jnp.float32)
    comp = comp.at[:, :, :9].set(comp9.reshape(nc, TRI_CHUNK, 9))

    big = jnp.float32(3.0e38)
    tri_min = jnp.minimum(jnp.minimum(pa_, pb_), pc_)
    tri_max = jnp.maximum(jnp.maximum(pa_, pb_), pc_)
    if pad:
        real = jnp.arange(nc * TRI_CHUNK) < p
        tri_min = jnp.where(real[:, None], tri_min, big)
        tri_max = jnp.where(real[:, None], tri_max, -big)
    bmin = tri_min.reshape(nc, TRI_CHUNK, 3).min(axis=1)
    bmax = tri_max.reshape(nc, TRI_CHUNK, 3).max(axis=1)
    return TriChunks(comp=comp, bmin=bmin, bmax=bmax, num_chunks=nc)


def build_accel_device(arrays: SceneArrays) -> tuple[TriChunks, SceneArrays]:
    """On-device LBVH 'build': Morton-sort the prims, permute the scene
    arrays, chunk.  Jit-traceable; call per frame for dynamic scenes."""
    pa, pb, pc = arrays.pa[1:], arrays.pb[1:], arrays.pc[1:]
    third = jnp.float32(1.0 / 3.0)
    cent = (pa + pb + pc) * third
    lo = jnp.min(jnp.minimum(jnp.minimum(pa, pb), pc), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(pa, pb), pc), axis=0)
    codes = morton_codes(cent, lo, hi)
    order = morton_order(codes)  # [P]

    perm = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), order.astype(jnp.int32) + 1]
    )
    arrays = dataclasses.replace(
        arrays,
        prim_mat=arrays.prim_mat[perm],
        pa=arrays.pa[perm],
        pb=arrays.pb[perm],
        pc=arrays.pc[perm],
        na=arrays.na[perm],
        nb=arrays.nb[perm],
        nc=arrays.nc[perm],
        shade_table=arrays.shade_table[perm],
    )
    chunks = device_chunks(arrays.pa, arrays.pb, arrays.pc)
    return chunks, arrays


class LbvhIntrs(IntrsHandler):
    name = "LBVH"

    def __init__(self, interpret: bool | None = None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def build(self, scene: Scene, arrays: SceneArrays):
        chunks, arrays = jax.jit(build_accel_device)(arrays)
        return chunks, arrays

    def stats(self, accel: TriChunks) -> IntrsStats:
        import numpy as _np

        # Honest device footprint (lane-padded chunk table + bounds).
        size = int(
            _np.prod(accel.comp.shape) * 4
            + _np.prod(accel.bmin.shape) * 4 * 2
        )
        return IntrsStats(name="LBVH", size=size)

    def intersect_fn(self, accel: TriChunks, arrays: SceneArrays, cfg: ComputeConfig):
        return partial(
            packet_closest_hit,
            accel,
            t_min=cfg.t_min,
            t_max=cfg.t_max,
            eps=cfg.eps,
            interpret=self.interpret,
        )
