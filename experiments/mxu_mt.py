"""MXU Möller–Trumbore experiment (VERDICT #4 / PERF.md remaining-cost #2).

det/u/v/wnum are bilinear in (ray, triangle) features:
    det  = d . (e2 x e1)
    u    = (o x d) . e2  - d . (e2 x a)
    v    = -(o x d) . e1 - d . (a x e1)
    wnum = o . n - e2 . (a x e1)        (w = wnum / det)
Ray features B[16,128]: rows 0-2 d, 3-5 o, 6-8 o x d, 9 ones, 10-15 zero.
Per-chunk coefficient matrix A[16, 4*tc], quantity-major columns
[det | u | v | wnum] -> one dot_general per (tile, chunk) on the MXU.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rt_rs_tpu.ops.pallas.packet_trace as pt
from rt_rs_tpu.ops.pallas.packet_trace import (
    LANES, TILE_GROUP, chunk_overlap_mask,
)

F = 16  # padded feature dim


def build_mxu_table(chunks) -> jax.Array:
    """[Nc, 16, 4*tc] coefficient table from a TriChunks.comp table."""
    comp = np.asarray(chunks.comp)  # [Nc, tc, 128]; lanes 0..8 = a,e1,e2
    nc, tc, _ = comp.shape
    a = comp[:, :, 0:3].reshape(-1, 3).astype(np.float64)
    e1 = comp[:, :, 3:6].reshape(-1, 3).astype(np.float64)
    e2 = comp[:, :, 6:9].reshape(-1, 3).astype(np.float64)
    n = np.cross(e1, e2)
    A = np.zeros((nc * tc, 4, F), dtype=np.float32)
    A[:, 0, 0:3] = np.cross(e2, e1)            # det: d-coeff
    A[:, 1, 0:3] = -np.cross(e2, a)            # u: d-coeff
    A[:, 1, 6:9] = e2                          # u: oxd-coeff
    A[:, 2, 0:3] = -np.cross(a, e1)            # v: d-coeff
    A[:, 2, 6:9] = -e1                         # v: oxd-coeff
    A[:, 3, 3:6] = n                           # wnum: o-coeff
    A[:, 3, 9] = -np.einsum("ij,ij->i", e2, np.cross(a, e1))  # const
    # -> [Nc, 16, 4*tc], quantity-major columns [det|u|v|wnum]
    A = A.reshape(nc, tc, 4, F).transpose(0, 3, 2, 1).reshape(nc, F, 4 * tc)
    return jnp.asarray(A)


def _mxu_kernel(
    counts_ref, ids_ref, rays_ref, tri_ref, out_t_ref, out_id_ref,
    *, t_min, t_max, eps, precision,
):
    miss = jnp.float32(t_max + 1.0)
    tile0 = pl.program_id(0) * TILE_GROUP
    r = rays_ref.shape[2]
    tc = tri_ref.shape[2] // 4

    sub = jax.lax.broadcasted_iota(jnp.int32, (tc, r), 0).astype(jnp.float32)

    def subtile_body(g, _):
        ox = rays_ref[g, 0:1, :]
        oy = rays_ref[g, 1:2, :]
        oz = rays_ref[g, 2:3, :]
        dx = rays_ref[g, 3:4, :]
        dy = rays_ref[g, 4:5, :]
        dz = rays_ref[g, 5:6, :]
        excl = rays_ref[g, 6:7, :]
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        ones = jnp.ones((1, r), jnp.float32)
        zeros = jnp.zeros((6, r), jnp.float32)
        B = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, cx, cy, cz, ones, zeros], axis=0
        )  # (16, r)

        def chunk_body(k, carry):
            bt, bid = carry
            c = ids_ref[g, 0, k]
            A = tri_ref[c]  # (16, 4*tc)
            C = jax.lax.dot_general(
                A, B, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (4*tc, r)
            det = C[0 * tc : 1 * tc]
            u = C[1 * tc : 2 * tc]
            v = C[2 * tc : 3 * tc]
            wnum = C[3 * tc : 4 * tc]

            sgn = jnp.sign(det)
            adet = jnp.abs(det)
            su = u * sgn
            sv = v * sgn
            ok = (
                (adet > eps)
                & (su >= 0.0) & (su <= adet)
                & (sv >= 0.0) & (su + sv <= adet)
            )
            w = wnum / jnp.where(ok, det, 1.0)
            ok = ok & (w > t_min) & (w < t_max)
            pid = sub + jnp.float32(1.0) + (c.astype(jnp.float32) * tc)
            ok = ok & (pid != excl)
            w = jnp.where(ok, w, miss)
            better = w < bt
            return jnp.where(better, w, bt), jnp.where(better, pid, bid)

        bt0 = jnp.full((tc, r), miss, dtype=jnp.float32)
        bid0 = jnp.zeros((tc, r), dtype=jnp.float32)
        bt, bid = jax.lax.fori_loop(
            0, counts_ref[tile0 + g], chunk_body, (bt0, bid0)
        )
        best = jnp.min(bt, axis=0, keepdims=True)
        bid_sel = jnp.where(bt == best, bid, jnp.float32(3.0e38))
        best_id = jnp.min(bid_sel, axis=0, keepdims=True)
        out_t_ref[g, :, :] = best
        out_id_ref[g, :, :] = jnp.where(
            best <= t_max, best_id, 0.0
        ).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, subtile_body, 0)


def packet_closest_hit_mxu(
    chunks, mxu_table, o, d, excl, valid=None, t_cap=None,
    *, t_min, t_max, eps, ray_tile=128, precision="highest",
    interpret=False,
):
    n = o.shape[0]
    nc = chunks.num_chunks
    t_tiles = max(1, -(-n // ray_tile))
    t_groups = -(-t_tiles // TILE_GROUP)
    t_tiles = t_groups * TILE_GROUP
    n_pad = t_tiles * ray_tile

    def pad_rays(x, fill=0.0):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)), constant_values=fill)

    o_p = pad_rays(o).reshape(t_tiles, ray_tile, 3)
    d_p = pad_rays(d).reshape(t_tiles, ray_tile, 3)
    excl_p = jnp.pad(excl, (0, n_pad - n)).reshape(t_tiles, ray_tile)
    inv_d = 1.0 / d_p
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    valid = jnp.pad(valid, (0, n_pad - n)).reshape(t_tiles, ray_tile)
    cap_p = (
        None if t_cap is None
        else jnp.pad(t_cap, (0, n_pad - n)).reshape(t_tiles, ray_tile)
    )
    overlap = chunk_overlap_mask(
        o_p, inv_d, valid, chunks.bmin, chunks.bmax,
        t_min=t_min, t_max=t_max, t_cap=cap_p,
    )
    order = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    counts = jnp.sum(overlap, axis=1, dtype=jnp.int32)

    rays = jnp.concatenate(
        [
            o_p.transpose(0, 2, 1),
            d_p.transpose(0, 2, 1),
            excl_p[:, None, :].astype(jnp.float32),
            jnp.zeros((t_tiles, 1, ray_tile), dtype=jnp.float32),
        ],
        axis=1,
    )
    nc_pad = -(-nc // 128) * 128
    ids = jnp.pad(order, ((0, 0), (0, nc_pad - nc)))
    prec = dict(
        default=jax.lax.Precision.DEFAULT,
        high=jax.lax.Precision.HIGH,
        highest=jax.lax.Precision.HIGHEST,
    )[precision]
    kernel = partial(
        _mxu_kernel, t_min=t_min, t_max=t_max, eps=eps, precision=prec
    )
    tc = mxu_table.shape[2] // 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[
            pl.BlockSpec(
                (TILE_GROUP, 1, nc_pad), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((TILE_GROUP, 8, ray_tile), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((nc, F, 4 * tc), lambda t, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_GROUP, 1, ray_tile), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((TILE_GROUP, 1, ray_tile), lambda t, *_: (t, 0, 0)),
        ],
    )
    out_t, out_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, 1, ray_tile), jnp.int32),
        ],
        interpret=interpret,
    )(counts, ids[:, None, :], rays, mxu_table)
    return out_t.reshape(n_pad)[:n], out_id.reshape(n_pad)[:n]


if __name__ == "__main__":
    from rt_rs_tpu.config import ComputeConfig
    from rt_rs_tpu.handlers import get_handler
    from rt_rs_tpu.ops import shade
    from rt_rs_tpu.scene import Scene
    from rt_rs_tpu.utils.sync import device_sync

    scene = Scene.load("/root/reference/scenes/teatime.json")
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    chunks = accel.segments[0] if hasattr(accel, "segments") else accel
    print("tc:", chunks.comp.shape[1], "nc:", chunks.num_chunks)
    mxu_table = build_mxu_table(chunks)

    W, H = 1920, 1080
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)
    o, d = shade.camera_rays(pos, at, W, H, block=(8, 16))
    n = o.shape[0]
    excl = jnp.zeros((n,), jnp.int32)

    vpu = jax.jit(partial(
        pt.packet_closest_hit, chunks,
        t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps,
    ))
    t0, id0 = vpu(o, d, excl)
    device_sync(t0)

    for precision in ["highest", "default"]:
        mxu = jax.jit(partial(
            packet_closest_hit_mxu, chunks, mxu_table,
            t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps,
            precision=precision,
        ))
        t1, id1 = mxu(o, d, excl)
        device_sync(t1)
        t0n, id0n = np.asarray(t0), np.asarray(id0)
        t1n, id1n = np.asarray(t1), np.asarray(id1)
        hit0 = id0n > 0
        pid_match = (id0n == id1n).mean()
        terr = np.abs(t1n[hit0 & (id1n == id0n)] - t0n[hit0 & (id1n == id0n)])
        rel = terr / np.maximum(t0n[hit0 & (id1n == id0n)], 1e-6)
        print(f"[{precision}] pid match {pid_match:.6f}, "
              f"t rel err max {rel.max():.3e}")

        # timing: chained calls, one sync
        for fn, name in [(vpu, "vpu"), (mxu, f"mxu/{precision}")]:
            out = fn(o, d, excl)
            device_sync(out[0])
            t0_ = time.perf_counter()
            for _ in range(20):
                out = fn(o, d, excl)
            device_sync(out[0])
            ms = (time.perf_counter() - t0_) / 20 * 1e3
            print(f"  {name}: {ms:.2f} ms (1080p primaries)")
