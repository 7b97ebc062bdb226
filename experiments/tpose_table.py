"""Transposed chunk-table experiment: components on sublanes, tris on
lanes ([Nc, 16, tc]) -> 64 B/tri VMEM instead of 512 B/tri, one
in-kernel (16, tc) -> (tc, 16) transpose per list entry."""
import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rt_rs_tpu.ops.pallas.packet_trace as pt
from rt_rs_tpu.ops.pallas.packet_trace import (
    TILE_GROUP, chunk_overlap_mask, build_tri_chunks,
)


def build_tri_chunks_t(pa, pb, pc, tri_chunk=128):
    """[Nc, 16, tc] float32: component c (a,e1,e2 xyz) at sublane c."""
    pa = np.asarray(pa, np.float32)[1:]
    pb = np.asarray(pb, np.float32)[1:]
    pc = np.asarray(pc, np.float32)[1:]
    p = pa.shape[0]
    nc = max(1, -(-p // tri_chunk))
    nc = -(-nc // 32) * 32  # CHUNK_ALIGN
    pad = nc * tri_chunk - p

    def padz(x):
        return np.pad(x, ((0, pad), (0, 0)))

    pa_, pb_, pc_ = padz(pa), padz(pb), padz(pc)
    e1 = pb_ - pa_
    e2 = pc_ - pa_
    comp9 = np.stack(
        [pa_[:, 0], pa_[:, 1], pa_[:, 2],
         e1[:, 0], e1[:, 1], e1[:, 2],
         e2[:, 0], e2[:, 1], e2[:, 2]], axis=1,
    )  # [P_pad, 9]
    comp = np.zeros((nc, 16, tri_chunk), np.float32)
    comp[:, :9, :] = comp9.reshape(nc, tri_chunk, 9).transpose(0, 2, 1)

    tri_min = np.minimum(np.minimum(pa_, pb_), pc_)
    tri_max = np.maximum(np.maximum(pa_, pb_), pc_)
    if pad:
        tri_min[p:] = np.float32(np.finfo(np.float32).max)
        tri_max[p:] = np.float32(-np.finfo(np.float32).max)
    bmin = tri_min.reshape(nc, tri_chunk, 3).min(axis=1)
    bmax = tri_max.reshape(nc, tri_chunk, 3).max(axis=1)
    return jnp.asarray(comp), jnp.asarray(bmin), jnp.asarray(bmax), nc


def _mt_kernel_t(
    counts_ref, ids_ref, rays_ref, tri_ref, out_t_ref, out_id_ref,
    *, t_min, t_max, eps,
):
    miss = jnp.float32(t_max + 1.0)
    tile0 = pl.program_id(0) * TILE_GROUP
    r = rays_ref.shape[2]
    tc = tri_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (tc, r), 0).astype(jnp.float32)

    def subtile_body(g, _):
        ox = rays_ref[g, 0:1, :]
        oy = rays_ref[g, 1:2, :]
        oz = rays_ref[g, 2:3, :]
        dx = rays_ref[g, 3:4, :]
        dy = rays_ref[g, 4:5, :]
        dz = rays_ref[g, 5:6, :]
        excl = rays_ref[g, 6:7, :]

        def chunk_body(k, carry):
            bt, bid = carry
            c = ids_ref[g, 0, k]
            chunk = jnp.transpose(tri_ref[c], (1, 0))  # (tc, 16)
            ax = chunk[:, 0:1]
            ay = chunk[:, 1:2]
            az = chunk[:, 2:3]
            e1x = chunk[:, 3:4]
            e1y = chunk[:, 4:5]
            e1z = chunk[:, 5:6]
            e2x = chunk[:, 6:7]
            e2y = chunk[:, 7:8]
            e2z = chunk[:, 8:9]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            tx = ox - ax
            ty = oy - ay
            tz = oz - az
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            det = e1x * px + e1y * py + e1z * pz
            u = tx * px + ty * py + tz * pz
            v = dx * qx + dy * qy + dz * qz
            sgn = jnp.sign(det)
            adet = jnp.abs(det)
            su = u * sgn
            sv = v * sgn
            ok = (
                (adet > eps)
                & (su >= 0.0) & (su <= adet)
                & (sv >= 0.0) & (su + sv <= adet)
            )
            w = (e2x * qx + e2y * qy + e2z * qz) / jnp.where(ok, det, 1.0)
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


def packet_closest_hit_t(
    tables, o, d, excl, valid=None, t_cap=None,
    *, t_min, t_max, eps, ray_tile=256, interpret=False,
):
    comp, bmin, bmax, nc = tables
    n = o.shape[0]
    t_tiles = max(1, -(-n // ray_tile))
    t_groups = -(-t_tiles // TILE_GROUP)
    t_tiles = t_groups * TILE_GROUP
    n_pad = t_tiles * ray_tile

    def pad_rays(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)))

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
        o_p, inv_d, valid, bmin, bmax,
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
    kernel = partial(_mt_kernel_t, t_min=t_min, t_max=t_max, eps=eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[
            pl.BlockSpec((TILE_GROUP, 1, nc_pad), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_GROUP, 8, ray_tile), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((nc, 16, comp.shape[2]), lambda t, *_: (0, 0, 0)),
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
    )(counts, ids[:, None, :], rays, comp)
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

    for tc_t in (64, 128):
        tables = build_tri_chunks_t(arrays.pa, arrays.pb, arrays.pc,
                                    tri_chunk=tc_t)
        W, H = 1920, 1080
        pos = jnp.asarray(scene.camera.pos, jnp.float32)
        at = jnp.asarray(scene.camera.at, jnp.float32)
        o, d = shade.camera_rays(pos, at, W, H, block=(16, 16))
        n = o.shape[0]
        excl = jnp.zeros((n,), jnp.int32)

        cur = jax.jit(partial(
            pt.packet_closest_hit, accel,
            t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps, ray_tile=256,
        ))
        new = jax.jit(partial(
            packet_closest_hit_t, tables,
            t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps, ray_tile=256,
        ))
        t0v, id0 = cur(o, d, excl)
        t1v, id1 = new(o, d, excl)
        device_sync(t1v)
        eq_t = np.array_equal(np.asarray(t0v), np.asarray(t1v))
        eq_id = np.array_equal(np.asarray(id0), np.asarray(id1))
        print(f"tc_t={tc_t} exact equal: t={eq_t} id={eq_id}", flush=True)
        for fn, name in [(cur, "current"), (new, f"tpose/tc{tc_t}")]:
            out = fn(o, d, excl)
            device_sync(out[0])
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(o, d, excl)
            device_sync(out[0])
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"  {name}: {ms:.2f} ms 1080p primaries", flush=True)

    # 50K-tri scene: transposed-resident vs segmented (full frame orbit)
    from rt_rs_tpu.config import Config, Resolution
    from rt_rs_tpu.renderer import Renderer

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
    vp_, vn_, pi_, pm_ = [], [], [], []
    for i, (dx, dy, dz) in enumerate(offsets):
        vp_.append(base.vert_pos + np.array([dx, dy, dz], np.float32))
        vn_.append(base.vert_norm)
        pi_.append(base.prim_indices + i * nv)
        pm_.append(base.prim_material)
    big.vert_pos = np.concatenate(vp_)
    big.vert_norm = np.concatenate(vn_)
    big.prim_indices = np.concatenate(pi_)
    big.prim_material = np.concatenate(pm_)

    # segmented baseline via Renderer
    r = Renderer(big, config=Config(resolution=Resolution.sized(640, 480)),
                 handler="pbvh")
    def orbit_ms(render_frame, orbitfn, frames=20):
        out = render_frame()
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(frames):
            out = render_frame()
            orbitfn()
        device_sync(out)
        return (time.perf_counter() - t0) / frames * 1e3
    mult = 2.0 * math.pi / 20 / 0.0314
    print(f"50K segmented: {orbit_ms(lambda: r.render_frame(block=False), lambda: r.orbit(mult)):.1f} ms", flush=True)

    # transposed fully-resident
    h2 = get_handler("pbvh")
    arrays2 = big.pack()
    accel2, arrays2 = h2.build(big, arrays2)  # reorders arrays (leaf order)
    tbl = build_tri_chunks_t(arrays2.pa, arrays2.pb, arrays2.pc, tri_chunk=64)
    print("tpose table MB:", tbl[0].size * 4 / 1e6, flush=True)
    cfg2 = ComputeConfig()
    cam = {"c": big.camera}

    @jax.jit
    def frame_t(pos, at):
        intersect = partial(
            packet_closest_hit_t, tbl,
            t_min=cfg2.t_min, t_max=cfg2.t_max, eps=cfg2.eps, ray_tile=256,
        )
        return shade.render(arrays2, intersect, cfg2, pos, at, 640, 480,
                            block=(16, 16))

    def rf2():
        return frame_t(jnp.asarray(cam["c"].pos, jnp.float32),
                       jnp.asarray(cam["c"].at, jnp.float32))
    def ob2():
        cam["c"] = cam["c"].orbited(mult)
    print(f"50K tpose-resident: {orbit_ms(rf2, ob2):.1f} ms", flush=True)
    # sanity: equality on one frame
    f_seg = np.asarray(r.render_frame(block=False))
    f_tp = np.asarray(frame_t(jnp.asarray(big.camera.pos, jnp.float32),
                              jnp.asarray(big.camera.at, jnp.float32)))
    print("frame equal:", np.array_equal(f_seg, f_tp),
          np.abs(f_seg - f_tp).max(), flush=True)
