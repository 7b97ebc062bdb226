"""Validate the SoA-shading hypothesis: [N,3] vector math uses 3/128
lanes; component-wise [N] arrays tile perfectly.  Times the same bounce
arithmetic both ways, plus the boundary conversion costs.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/soa_shade.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.shade import _hit_from_rows, _light_terms
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
    row = jnp.asarray(table[pid])
    k = arrays.num_lights

    # ---- AoS reference (same as shade_micro B + D) ----
    def aos(row, o, d, t):
        valid = (row[:, 25] != -1.0) & (t < cfg.t_max) & (t > cfg.t_min)
        at, normal = _hit_from_rows(row, o, d, t)
        diffuse = jnp.zeros((n,), jnp.float32)
        spec = jnp.zeros((n,), jnp.float32)
        for j in range(k):
            lp = jnp.broadcast_to(arrays.light_pos[j][None, :], (n, 3))
            ls = jnp.broadcast_to(arrays.light_strength[j], (n,))
            dk, sk = _light_terms(lp, ls, at, normal, d, row[:, 24])
            diffuse = diffuse + dk
            spec = spec + sk
        color = (
            row[:, 18:21] * (diffuse * row[:, 21])[:, None]
            + (spec * row[:, 22])[:, None]
        )
        # shadow-ray build too
        at3 = at[None, :, :]
        lps = jnp.stack([
            jnp.broadcast_to(arrays.light_pos[j][None, :], (n, 3))
            for j in range(k)
        ])
        delta = lps - at3
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        ldir = delta / dist[..., None]
        side = jnp.sum(ldir * normal[None], axis=-1)
        s_off = jnp.where(side[..., None] < 0, -0.001, 0.001) * normal[None]
        so = (at3 + s_off).reshape(k * n, 3)
        return jnp.where(valid[:, None], color, 0.0), so, ldir.reshape(k * n, 3), dist

    print(f"AoS bounce+shadow:   {timed(jax.jit(aos), row, o, d, t):6.1f} ms")

    # ---- SoA version ----
    cols = jnp.asarray(row.T)  # [32, N] pre-transposed for the pure-math timing
    ox, oy, oz = (jnp.asarray(o[:, i]) for i in range(3))
    dx, dy, dz = (jnp.asarray(d[:, i]) for i in range(3))

    def soa(cols, ox, oy, oz, dx, dy, dz, t):
        C = lambda i: cols[i]
        valid = (C(25) != -1.0) & (t < cfg.t_max) & (t > cfg.t_min)
        # hit position
        hx, hy, hz = ox + dx * t, oy + dy * t, oz + dz * t
        bx, by, bz = C(0), C(1), C(2)
        cx, cy, cz = C(3), C(4), C(5)
        ax, ay, az = C(6), C(7), C(8)
        v0x, v0y, v0z = bx - ax, by - ay, bz - az
        v1x, v1y, v1z = cx - ax, cy - ay, cz - az
        v2x, v2y, v2z = hx - ax, hy - ay, hz - az
        d00 = v0x * v0x + v0y * v0y + v0z * v0z
        d01 = v0x * v1x + v0y * v1y + v0z * v1z
        d11 = v1x * v1x + v1y * v1y + v1z * v1z
        d20 = v2x * v0x + v2y * v0y + v2z * v0z
        d21 = v2x * v1x + v2y * v1y + v2z * v1z
        denom = d00 * d11 - d01 * d01
        denom = jnp.where(denom == 0.0, 1.0, denom)
        vv = (d11 * d20 - d01 * d21) / denom
        ww = (d00 * d21 - d01 * d20) / denom
        uu = 1.0 - vv - ww
        nx = C(9) * vv + C(12) * ww + C(15) * uu
        ny = C(10) * vv + C(13) * ww + C(16) * uu
        nz = C(11) * vv + C(14) * ww + C(17) * uu
        rn = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
        nx, ny, nz = nx * rn, ny * rn, nz * rn
        diffuse = jnp.zeros_like(t)
        spec = jnp.zeros_like(t)
        sos, sds, dists = [], [], []
        for j in range(k):
            lx, ly, lz = (arrays.light_pos[j][i] for i in range(3))
            ls = arrays.light_strength[j]
            ddx, ddy, ddz = lx - hx, ly - hy, lz - hz
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            inv = 1.0 / dist
            ux, uy, uz = ddx * inv, ddy * inv, ddz * inv
            dot = ux * nx + uy * ny + uz * nz
            diffuse = diffuse + ls * jnp.maximum(0.0, dot)
            # reflect(-u, n) = -u - 2*dot(-u,n)*n -> spec
            rx = -ux + 2.0 * dot * nx
            ry = -uy + 2.0 * dot * ny
            rz = -uz + 2.0 * dot * nz
            sdot = -(rx * dx + ry * dy + rz * dz)
            spec = spec + jnp.power(jnp.maximum(0.0, sdot), C(24)) * ls
            off = jnp.where(dot < 0, -0.001, 0.001)
            sos.append((hx + off * nx, hy + off * ny, hz + off * nz))
            sds.append((ux, uy, uz))
            dists.append(dist)
        cr = C(18) * diffuse * C(21) + spec * C(22)
        cg = C(19) * diffuse * C(21) + spec * C(22)
        cb = C(20) * diffuse * C(21) + spec * C(22)
        z = jnp.where(valid, cr, 0.0), jnp.where(valid, cg, 0.0), jnp.where(valid, cb, 0.0)
        return z, sos, sds, dists

    print(f"SoA bounce+shadow:   {timed(jax.jit(soa), cols, ox, oy, oz, dx, dy, dz, t):6.1f} ms")

    # boundary costs
    print(f"row.T [N,32]->[32,N]: {timed(jax.jit(lambda r: r.T + 0.0), row):6.1f} ms")
    print(f"gather+T fused:       {timed(jax.jit(lambda tab, p: tab[p].T + 0.0), table, pid):6.1f} ms")
    print(f"o split 3x[N]:        {timed(jax.jit(lambda o_: tuple(o_[:, i] + 0.0 for i in range(3))), o):6.1f} ms")
    print(f"stack 3x[N]->[N,3]:   {timed(jax.jit(lambda a, b, c: jnp.stack([a, b, c], axis=-1) + 0.0), ox, oy, oz):6.1f} ms")


if __name__ == "__main__":
    main()
