"""Packet-BVH backend: the TPU fast path (Pallas kernel).

Functionally equivalent to the ``bvh`` backend (same BVH build, same
leaf reorder, same closest-hit semantics — verified against ``naive``
in ``tests/test_pbvh.py``), but intersection runs as the Pallas packet
kernel of :mod:`rt_rs_tpu.ops.pallas.packet_trace`: ray tiles on VPU
lanes, leaf-ordered 8-triangle chunks on sublanes, conservative
interval culling instead of per-ray tree descent.

This is the handler the flagship benchmarks use.  The ``bvh`` handler
remains the reference-parity backend (stackless threaded traversal, and
the loader for precomputed ``*.bvh.json`` checkpoints).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

import numpy as np

from rt_rs_tpu.bvh import BvhData, build_bvh
from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers.base import IntrsHandler, IntrsStats
from rt_rs_tpu.handlers.bvh import reorder_scene_arrays
from rt_rs_tpu.ops.pallas.packet_trace import (
    TriChunks,
    build_tri_chunks,
    packet_closest_hit,
)
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.arrays import SceneArrays


DEFAULT_TRI_CHUNK = 64  # resident-kernel chunk height (PERF.md sweep)


def _default_interpret() -> bool:
    # Pallas TPU kernels run compiled on TPU; everywhere else (CPU
    # tests, virtual device meshes) use the interpreter.
    return jax.default_backend() != "tpu"


class PacketBvhIntrs(IntrsHandler):
    name = "Packet-BVH"

    def __init__(
        self,
        eps: float = 0.02,
        target_item_count: int = 2,
        data: BvhData | None = None,
        path: str | None = None,
        interpret: bool | None = None,
        cull_block: int | None = None,
        ray_tile: int | None = None,
        tri_chunk: int | None = None,
    ):
        self.eps = eps
        self.target_item_count = target_item_count
        self._data = data
        if path is not None:
            self._data = BvhData.load(path)
        self.interpret = (
            _default_interpret() if interpret is None else interpret
        )
        self.cull_block = cull_block
        self.ray_tile = ray_tile
        self.tri_chunk = tri_chunk
        self.bvh_data: BvhData | None = self._data

    def build(self, scene: Scene, arrays: SceneArrays):
        data = self._data
        if data is None:
            data = build_bvh(
                scene, eps=self.eps, target_item_count=self.target_item_count
            )
        self.bvh_data = data
        arrays = reorder_scene_arrays(arrays, data.indices)
        from rt_rs_tpu.ops.pallas.packet_trace import (
            MAX_VMEM_CHUNKS,
            TRI_CHUNK,
        )

        n_tris = arrays.pa.shape[0] - 1  # minus the null sentinel
        self._streaming = n_tris > MAX_VMEM_CHUNKS * TRI_CHUNK
        # The streaming kernel's DMA blocks are fixed at 32 chunks of 8
        # triangles; the resident kernel defaults to 64-triangle chunks
        # (measured optimum: amortizes the per-list-entry overhead that
        # dominated the 8-tri layout -- see PERF.md).
        if self._streaming:
            tri_chunk = TRI_CHUNK
        elif self.tri_chunk is None:
            tri_chunk = DEFAULT_TRI_CHUNK
        else:
            tri_chunk = self.tri_chunk
        chunks = build_tri_chunks(
            arrays.pa, arrays.pb, arrays.pc,
            max_chunks=None, tri_chunk=tri_chunk,
        )
        return chunks, arrays

    def stats(self, accel: TriChunks) -> IntrsStats:
        # Honest device footprint: the lane-padded chunk table
        # [Nc, 8, 128] f32 (4 KB/chunk) + bounds — what actually
        # occupies VMEM/HBM, comparable with BVH's 48 B/node and RF's
        # 16 B/record numbers.
        size = int(
            np.prod(accel.comp.shape) * 4
            + np.prod(accel.bmin.shape) * 4 * 2
        )
        return IntrsStats(name="Packet-BVH", size=size)

    def intersect_fn(self, accel: TriChunks, arrays: SceneArrays, cfg: ComputeConfig):
        from rt_rs_tpu.ops.pallas.packet_trace import (
            MAX_VMEM_CHUNKS,
            TRI_CHUNK,
        )

        if accel.num_chunks * accel.comp.shape[1] > MAX_VMEM_CHUNKS * TRI_CHUNK:
            # HBM-resident table, DMA-streamed in 32-chunk blocks.
            from rt_rs_tpu.ops.pallas.packet_stream import stream_closest_hit

            return partial(
                stream_closest_hit,
                accel,
                t_min=cfg.t_min,
                t_max=cfg.t_max,
                eps=cfg.eps,
                interpret=self.interpret,
            )
        kwargs = {}
        if self.cull_block is not None:
            kwargs["cull_block"] = self.cull_block
        if self.ray_tile is not None:
            kwargs["ray_tile"] = self.ray_tile
        return partial(
            packet_closest_hit,
            accel,
            t_min=cfg.t_min,
            t_max=cfg.t_max,
            eps=cfg.eps,
            interpret=self.interpret,
            **kwargs,
        )
