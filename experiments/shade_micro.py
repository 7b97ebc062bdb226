"""Micro-bench the pieces of ONE bounce's shading at 1080p with all
inputs passed as jit arguments (no constant folding).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/shade_micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.shade import _hit_from_rows, _light_terms, _normalize
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

W, H = 1920, 1080
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    scene = Scene.load("/root/reference/scenes/teatime.json")
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    isect = handler.intersect_fn(accel, arrays, cfg)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    cam_at = jnp.asarray(scene.camera.at, jnp.float32)

    o, d = shade.camera_rays(pos, cam_at, W, H, block=(16, 16))
    n = o.shape[0]
    t, pid = isect(o, d, jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool))
    t, pid = jnp.asarray(t), jnp.asarray(pid)
    table = arrays.shade_table

    # A: the row gather alone
    f_gather = jax.jit(lambda tab, p: tab[p])
    print(f"A row gather [N,32]:      {timed(f_gather, table, pid):6.1f} ms")

    row = jnp.asarray(table[pid])

    # B: arithmetic of one bounce from a pre-gathered row
    def bounce_arith(row, o, d, t):
        valid = (row[:, 25] != -1.0) & (t < cfg.t_max) & (t > cfg.t_min)
        mat_color = row[:, 18:21]
        mat_albedo = row[:, 21:24]
        mat_spec = row[:, 24]
        at, normal = _hit_from_rows(row, o, d, t)
        diffuse = jnp.zeros((n,), jnp.float32)
        spec = jnp.zeros((n,), jnp.float32)
        for j in range(arrays.num_lights):
            lp = jnp.broadcast_to(arrays.light_pos[j][None, :], (n, 3))
            ls = jnp.broadcast_to(arrays.light_strength[j], (n,))
            dk, sk = _light_terms(lp, ls, at, normal, d, mat_spec)
            diffuse = diffuse + dk
            spec = spec + sk
        color = (
            mat_color * (diffuse * mat_albedo[:, 0])[:, None]
            + (spec * mat_albedo[:, 1])[:, None]
        )
        return jnp.where(valid[:, None], color, 0.0)

    print(f"B bounce arithmetic:      {timed(jax.jit(bounce_arith), row, o, d, t):6.1f} ms")

    # C: B including the gather
    def bounce_full(tab, p, o, d, t):
        return bounce_arith(tab[p], o, d, t)

    print(f"C gather + arithmetic:    {timed(jax.jit(bounce_full), table, pid, o, d, t):6.1f} ms")

    # D: shadow-ray construction (the part feeding the next intersect)
    def shadow_build(row, o, d, t):
        at, normal = _hit_from_rows(row, o, d, t)
        k = arrays.num_lights
        lp = jnp.stack([
            jnp.broadcast_to(arrays.light_pos[j][None, :], (n, 3))
            for j in range(k)
        ])
        delta = lp - at[None, :, :]
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        ldir = _normalize(delta)
        side = jnp.sum(ldir * normal[None, :, :], axis=-1)
        s_off = jnp.where(side[..., None] < 0, -0.001, 0.001) * normal[None]
        so = (at[None] + s_off).reshape(k * n, 3)
        sd = ldir.reshape(k * n, 3)
        return so, sd, dist.reshape(k * n)

    print(f"D shadow-ray build (k=2): {timed(jax.jit(shadow_build), row, o, d, t):6.1f} ms")

    # E: hit_from_rows alone
    print(f"E hit_from_rows:          {timed(jax.jit(lambda r_, o_, d_, t_: _hit_from_rows(r_, o_, d_, t_)), row, o, d, t):6.1f} ms")

    # F: 4x chained gathers (different index arrays, forced sequential)
    pids = [jnp.asarray((np.asarray(pid) + i) % table.shape[0]) for i in range(4)]

    def chain(tab, p0, p1, p2, p3):
        acc = tab[p0]
        acc = acc + tab[(p1 + acc[:, 0].astype(jnp.int32)) % table.shape[0]]
        acc = acc + tab[(p2 + acc[:, 1].astype(jnp.int32)) % table.shape[0]]
        acc = acc + tab[(p3 + acc[:, 2].astype(jnp.int32)) % table.shape[0]]
        return acc

    print(f"F 4 chained gathers:      {timed(jax.jit(chain), table, *pids):6.1f} ms")


if __name__ == "__main__":
    main()
