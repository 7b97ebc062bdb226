"""Streaming packet tracer: HBM-resident scenes of arbitrary size.

The resident kernel (``packet_trace.py``) keeps the whole chunk table
in VMEM — ideal up to ~12K triangles (every bundled scene), impossible
beyond.  This variant keeps the table in HBM and DMAs 512-triangle
*blocks* (256 KB) through a double-buffered VMEM scratch, so scene
size is bounded by HBM, not VMEM.

Structure per grid step (one group of ``TILE_GROUP`` ray tiles):

1. the host computed, per group, the compacted list of blocks any of
   its rays might hit (the same interval culling, reduced at chunk
   granularity and packed into one bitfield word per block: bit j =
   "this subtile overlaps chunk j of the block");
2. the kernel walks that list with ``make_async_copy`` double
   buffering: while block ``b`` is being tested, ``b+1`` is in flight;
3. for each fetched block, subtiles whose bitfield word is zero skip it
   entirely (``pl.when`` around scratch-ref updates — legal because
   accumulators live in VMEM scratch, not loop carries); surviving
   subtiles run ``tri_chunk x 128`` Möller–Trumbore lattices, with each
   chunk's per-subtile bit folded into the hit mask.

The chunk height is taken from the table (``chunks.comp.shape[1]``):
with the 64-triangle chunks the handlers build (PERF.md), a block is 4
iterations of (64, 128) math instead of 32 of (8, 128) — the same
fixed-cost amortization that doubled the resident kernel.

Accumulators (best-t / best-id per subtile) persist in VMEM scratch
across the block loop and are reduced to the outputs at the end.

Exactness matches the resident kernel (verified against naive brute
force in tests/test_stream.py, including a 50K-triangle scene).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_rs_tpu.ops.pallas.packet_trace import (
    LANES,
    RAY_TILE,
    TILE_GROUP,
    TriChunks,
    chunk_overlap_mask,
    mt_chunk_test,
)

BLOCK_SUBLANES = 512  # triangles per streamed DMA block (256 KB)


def _mt_stream_kernel(
    counts_ref,  # SMEM [Tg] int32 (prefetch): blocks per group
    blockids_ref,  # SMEM (1, 1, NBpad) int32: compacted block list
    words_ref,  # SMEM (G, 1, NB) int32: per-subtile chunk bits by block
    rays_ref,  # VMEM (G, 8, RAY_TILE) f32
    tri_hbm,  # ANY/HBM (NB, block_sublanes, 128) f32: chunk table, blocked
    out_t_ref,  # VMEM (G, 1, RAY_TILE) f32
    out_id_ref,  # VMEM (G, 1, RAY_TILE) int32
    acc_t,  # VMEM scratch (G, tc, RAY_TILE) f32
    acc_id,  # VMEM scratch (G, tc, RAY_TILE) f32
    buf,  # VMEM scratch (2, BLOCK_SUBLANES, 128) f32: double buffer
    sem,  # DMA semaphores (2,)
    *,
    t_min: float,
    t_max: float,
    eps: float,
    tri_chunk: int,
):
    group = pl.program_id(0)
    miss = jnp.float32(t_max + 1.0)
    nb = counts_ref[group]
    tc = tri_chunk
    cpb = buf.shape[1] // tc  # chunks per block (buf is one DMA block)

    sub = jax.lax.broadcasted_iota(
        jnp.int32, (tc, RAY_TILE), 0
    ).astype(jnp.float32)

    # Init accumulators.
    def init_body(g, _):
        acc_t[g] = jnp.full((tc, RAY_TILE), miss, dtype=jnp.float32)
        acc_id[g] = jnp.zeros((tc, RAY_TILE), dtype=jnp.float32)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, init_body, 0)

    def fetch(k, slot):
        return pltpu.make_async_copy(
            tri_hbm.at[blockids_ref[0, 0, k]],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nb > 0)
    def _():
        fetch(0, 0).start()

    def block_body(b, _):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            fetch(b + 1, 1 - slot).start()

        fetch(b, slot).wait()
        blk = blockids_ref[0, 0, b]

        def subtile_body(g, _):
            word = words_ref[g, 0, blk]

            @pl.when(word != 0)
            def _():
                ox = rays_ref[g, 0:1, :]
                oy = rays_ref[g, 1:2, :]
                oz = rays_ref[g, 2:3, :]
                dx = rays_ref[g, 3:4, :]
                dy = rays_ref[g, 4:5, :]
                dz = rays_ref[g, 5:6, :]
                excl = rays_ref[g, 6:7, :]

                def chunk_body(cj, carry):
                    bt, bid = carry
                    bit = (word >> cj) & 1
                    chunk = buf[slot, pl.ds(cj * tc, tc), :]
                    c_global = blk * cpb + cj
                    pid = (
                        sub
                        + jnp.float32(1.0)
                        + c_global.astype(jnp.float32) * tc
                    )
                    # The shared resident-kernel test (op-for-op
                    # exactness by construction); the block-list bit
                    # gates this chunk via extra_ok.
                    ok, w = mt_chunk_test(
                        chunk, ox, oy, oz, dx, dy, dz, pid, excl,
                        t_min=t_min, t_max=t_max, eps=eps,
                        extra_ok=(bit == 1),
                    )

                    w = jnp.where(ok, w, miss)
                    better = w < bt
                    return (
                        jnp.where(better, w, bt),
                        jnp.where(better, pid, bid),
                    )

                bt, bid = jax.lax.fori_loop(
                    0, cpb, chunk_body, (acc_t[g], acc_id[g])
                )
                acc_t[g] = bt
                acc_id[g] = bid

            return 0

        jax.lax.fori_loop(0, TILE_GROUP, subtile_body, 0)
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)

    # Reduce accumulators to per-ray outputs.
    def out_body(g, _):
        bt = acc_t[g]
        bid = acc_id[g]
        best = jnp.min(bt, axis=0, keepdims=True)
        big_id = jnp.float32(3.0e38)
        best_id = jnp.min(
            jnp.where(bt == best, bid, big_id), axis=0, keepdims=True
        )
        out_t_ref[g, :, :] = best
        out_id_ref[g, :, :] = jnp.where(
            best <= t_max, best_id, 0.0
        ).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, out_body, 0)


def stream_closest_hit(
    chunks: TriChunks,
    o: jax.Array,
    d: jax.Array,
    excl: jax.Array,
    valid: jax.Array | None = None,
    t_cap: jax.Array | None = None,
    *,
    t_min: float,
    t_max: float,
    eps: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Closest hit over an HBM-resident chunk table -> (t [N], pid [N])."""
    n = o.shape[0]
    nc = chunks.num_chunks
    tc = int(chunks.comp.shape[1])
    # Chunks per block is capped at 32 (one bit per chunk in the int32
    # overlap word), so small chunks get proportionally smaller DMA
    # blocks (tc=8 -> 256-tri blocks, tc>=16 -> 512).
    cpb = min(32, max(1, BLOCK_SUBLANES // tc))
    block_sublanes = cpb * tc
    # Prim ids travel as f32 inside the kernel (exact below 2^24).
    if nc * tc + 1 >= (1 << 24):
        raise ValueError(
            f"{nc * tc} triangles exceeds the kernel's exact-f32 "
            "prim-id range (2^24); shard the scene or widen pid handling"
        )
    nb = -(-nc // cpb)
    t_tiles = max(1, -(-n // RAY_TILE))
    t_groups = -(-t_tiles // TILE_GROUP)
    t_tiles = t_groups * TILE_GROUP
    n_pad = t_tiles * RAY_TILE

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)))

    o_p = pad_rays(o).reshape(t_tiles, RAY_TILE, 3)
    d_p = pad_rays(d).reshape(t_tiles, RAY_TILE, 3)
    excl_p = jnp.pad(excl, (0, n_pad - n)).reshape(t_tiles, RAY_TILE)
    inv_d = 1.0 / d_p
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    valid = jnp.pad(valid, (0, n_pad - n)).reshape(t_tiles, RAY_TILE)
    cap_p = (
        None
        if t_cap is None
        else jnp.pad(t_cap, (0, n_pad - n)).reshape(t_tiles, RAY_TILE)
    )

    overlap = chunk_overlap_mask(
        o_p, inv_d, valid, chunks.bmin, chunks.bmax,
        t_min=t_min, t_max=t_max, t_cap=cap_p,
    )  # [T, Nc]

    # Bitfield words: one int32 per block per subtile, bit j = chunk j.
    nc_pad = nb * cpb
    bits = jnp.pad(overlap, ((0, 0), (0, nc_pad - nc))).astype(jnp.int32)
    weights = jnp.int32(1) << jnp.arange(cpb, dtype=jnp.int32)
    words = jnp.sum(
        bits.reshape(t_tiles, nb, cpb) * weights[None, None, :],
        axis=-1,
        dtype=jnp.int32,
    )  # [T, NB]

    # Per-group block list: any subtile's word nonzero.
    group_words = words.reshape(t_groups, TILE_GROUP, nb)
    block_any = jnp.any(group_words != 0, axis=1)  # [Tg, NB]
    order = jnp.argsort(~block_any, axis=1, stable=True).astype(jnp.int32)
    counts = jnp.sum(block_any, axis=1, dtype=jnp.int32)
    nb_pad = -(-nb // 128) * 128
    blockids = jnp.pad(order, ((0, 0), (0, nb_pad - nb)))

    rays = jnp.concatenate(
        [
            o_p.transpose(0, 2, 1),
            d_p.transpose(0, 2, 1),
            excl_p[:, None, :].astype(jnp.float32),
            valid[:, None, :].astype(jnp.float32),
        ],
        axis=1,
    )  # [T, 8, 128]

    # Chunk table blocked for DMA: [NB, 256, 128].
    tri = chunks.comp
    pad_chunks = nc_pad - nc
    if pad_chunks:
        tri = jnp.pad(tri, ((0, pad_chunks), (0, 0), (0, 0)))
    tri = tri.reshape(nb, block_sublanes, LANES)

    kernel = partial(
        _mt_stream_kernel, t_min=t_min, t_max=t_max, eps=eps, tri_chunk=tc
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, nb_pad),
                lambda t, *_: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (TILE_GROUP, 1, nb),
                lambda t, *_: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((TILE_GROUP, 8, RAY_TILE), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # tri table stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE_GROUP, 1, RAY_TILE), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((TILE_GROUP, 1, RAY_TILE), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_GROUP, tc, RAY_TILE), jnp.float32),
            pltpu.VMEM((TILE_GROUP, tc, RAY_TILE), jnp.float32),
            pltpu.VMEM((2, block_sublanes, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t, out_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_tiles, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, 1, RAY_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(counts, blockids[:, None, :], words[:, None, :], rays, tri)

    return out_t.reshape(n_pad)[:n], out_id.reshape(n_pad)[:n]
