"""Fused per-bounce shading kernels over component-major ray tiles.

Round-2 profiling (experiments/frame_profile.py) showed the 1080p
full-fidelity frame is SHADING-bound: the XLA bounce loop costs ~40 ms
per bounce — dominated not by FLOPs but by [N,3]-shaped elementwise
passes (3/128 lane utilization), fusion-barrier materializations around
each Pallas intersect call, and full-size work on bounces whose rays are
almost all dead (live counts per bounce at 1080p: 2.07M / 663K / 18K /
2.4K).

These kernels replace that with the same restructuring the packet
tracer uses (``packet_trace.py``): rays on lanes, components on
sublanes, tiles of ``r`` rays.  All tiled arrays are component-major
``[C, T, r]`` so an 8-tile *subgroup* of any component is one
contiguous native ``(8, r)`` block — the whole bounce (barycentric
normal interpolation, Blinn/Phong terms, shadow/reflection ray
construction, color accumulation; compute.wgsl:120-280) runs as dense
``(8, r)`` VPU math with zero gathers and zero [N,3] relayouts, and
subgroups whose 8 tiles hold no live ray are skipped entirely — dead
bounces cost (almost) nothing.

Two kernels per bounce, split at the intersect call (a Pallas custom
call is a fusion barrier, so the bounce's shading is necessarily in two
halves):

* ``shade_pre`` — hit position + interpolated normal, then the shadow
  ray payload/cap per light and the reflection continuation payload
  (compute.wgsl:189-212, 267-276).
* ``shade_post`` — shadow verdicts, per-light diffuse/specular, color
  contribution (compute.wgsl:219-265).

Numerical parity: op-for-op the same f32 operations as the XLA
reference implementation (:func:`rt_rs_tpu.ops.shade.trace`, itself
oracle-verified); Mosaic may contract FMAs differently, so outputs can
drift by ~1 ULP (gated by tests/test_shade_tiled.py at tight
tolerance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_rs_tpu.ops.pallas.packet_trace import (  # noqa: E402
    TILE_GROUP,  # tiles per grid step — one constant for all tiled kernels
)

SUBGROUP = 8  # tiles per in-kernel iteration: (8, r) native blocks


def _hit_normal(C, o, d, t):
    """at + interpolated unit normal, op-for-op the XLA
    ``_hit_from_rows`` (shade.py; compute.wgsl:120-151 incl. the corner
    rotation already baked into the shade-table column order)."""
    ox, oy, oz = o
    dx, dy, dz = d
    hx = ox + dx * t
    hy = oy + dy * t
    hz = oz + dz * t
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
    return (hx, hy, hz), (nx * rn, ny * rn, nz * rn)


def _pre_subgroup(
    g0,
    rows_ref, pay_ref, t_ref, pid_ref, lights_ref,
    sh_refs, cap_refs, mask_refs, next_ref,
    k: int,
    emit_next: bool,
):
    """One subgroup of the shade_pre computation (shadow payload/cap
    construction, zero-contribution cull mask + reflection
    continuation); shared by the standalone pre kernel and the fused
    bounce kernel."""

    def compute():
        C = lambda c: rows_ref[c, pl.ds(g0, SUBGROUP), :]
        o = tuple(pay_ref[c, pl.ds(g0, SUBGROUP), :] for c in range(3))
        d = tuple(
            pay_ref[c, pl.ds(g0, SUBGROUP), :] for c in range(3, 6)
        )
        t = t_ref[pl.ds(g0, SUBGROUP), :]
        pid = pid_ref[pl.ds(g0, SUBGROUP), :]
        (hx, hy, hz), (nx, ny, nz) = _hit_normal(C, o, d, t)
        dx, dy, dz = d
        spec_pow = C(24)

        for li in range(k):
            lx = lights_ref[li, 0]
            ly = lights_ref[li, 1]
            lz = lights_ref[li, 2]
            ls = lights_ref[li, 3]
            ddx, ddy, ddz = lx - hx, ly - hy, lz - hz
            s = ddx * ddx + ddy * ddy + ddz * ddz
            dist = jnp.sqrt(s)
            inv = jax.lax.rsqrt(s)
            ux, uy, uz = ddx * inv, ddy * inv, ddz * inv
            side = ux * nx + uy * ny + uz * nz
            off = jnp.where(side < 0.0, jnp.float32(-0.001), jnp.float32(0.001))
            sh_refs[li][0, pl.ds(g0, SUBGROUP), :] = hx + off * nx
            sh_refs[li][1, pl.ds(g0, SUBGROUP), :] = hy + off * ny
            sh_refs[li][2, pl.ds(g0, SUBGROUP), :] = hz + off * nz
            sh_refs[li][3, pl.ds(g0, SUBGROUP), :] = ux
            sh_refs[li][4, pl.ds(g0, SUBGROUP), :] = uy
            sh_refs[li][5, pl.ds(g0, SUBGROUP), :] = uz
            sh_refs[li][6, pl.ds(g0, SUBGROUP), :] = pid
            # Row 7: per-ray occlusion bound for the any-hit shadow
            # kernel (closest-hit kernels ignore it).
            sh_refs[li][7, pl.ds(g0, SUBGROUP), :] = dist
            cap_refs[li][pl.ds(g0, SUBGROUP), :] = dist
            # Zero-contribution shadow cull: the blocked verdict is
            # unobservable when BOTH of shade_post's terms for this
            # light are zero — diffuse needs side > 0, specular needs
            # sdot > 0 (pow(0, p) == 0 for p > 0; p <= 0 keeps the
            # ray since pow(0, 0) == 1), and either needs strength
            # > 0.  sdot is computed with the same op sequence as
            # shade_post (compute.wgsl:160-175) so in interpret mode
            # the predicate is exactly consistent; compiled Mosaic may
            # contract FMAs differently, bounding any knife-edge
            # divergence to an ~ULP-sized contribution (same class as
            # the trace()/trace_tiled() drift, PERF.md).
            eux, euy, euz = -ux, -uy, -uz
            den = eux * nx + euy * ny + euz * nz
            rfx = eux - 2.0 * den * nx
            rfy = euy - 2.0 * den * ny
            rfz = euz - 2.0 * den * nz
            sdot = (-rfx) * dx + (-rfy) * dy + (-rfz) * dz
            need = (ls > 0.0) & (
                (side > 0.0) | (sdot > 0.0) | (spec_pow <= 0.0)
            )
            mask_refs[li][pl.ds(g0, SUBGROUP), :] = need.astype(
                jnp.float32
            )

        if emit_next:
            # reflect(d, n) = d - 2 dot(d, n) n, normalized
            # (compute.wgsl:267-276).
            dx, dy, dz = d
            dn = dx * nx + dy * ny + dz * nz
            rx = dx - 2.0 * dn * nx
            ry = dy - 2.0 * dn * ny
            rz = dz - 2.0 * dn * nz
            rr = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
            rx, ry, rz = rx * rr, ry * rr, rz * rr
            rside = rx * nx + ry * ny + rz * nz
            roff = jnp.where(
                rside < 0.0, jnp.float32(-0.001), jnp.float32(0.001)
            )
            next_ref[0, pl.ds(g0, SUBGROUP), :] = hx + roff * nx
            next_ref[1, pl.ds(g0, SUBGROUP), :] = hy + roff * ny
            next_ref[2, pl.ds(g0, SUBGROUP), :] = hz + roff * nz
            next_ref[3, pl.ds(g0, SUBGROUP), :] = rx
            next_ref[4, pl.ds(g0, SUBGROUP), :] = ry
            next_ref[5, pl.ds(g0, SUBGROUP), :] = rz
            next_ref[6, pl.ds(g0, SUBGROUP), :] = jnp.zeros_like(rx)
            next_ref[7, pl.ds(g0, SUBGROUP), :] = jnp.zeros_like(rx)

    def dead():
        z8 = jnp.zeros((SUBGROUP, t_ref.shape[1]), dtype=jnp.float32)
        for li in range(k):
            for c in range(8):
                sh_refs[li][c, pl.ds(g0, SUBGROUP), :] = z8
            cap_refs[li][pl.ds(g0, SUBGROUP), :] = z8
            mask_refs[li][pl.ds(g0, SUBGROUP), :] = z8
        if emit_next:
            for c in range(8):
                next_ref[c, pl.ds(g0, SUBGROUP), :] = z8

    return compute, dead


def _shade_pre_kernel(
    live_ref,  # SMEM [T // SUBGROUP] int32 (scalar prefetch)
    rows_ref,  # VMEM (32, G, r): gathered shade-table, component-major
    pay_ref,  # VMEM (8, G, r): ox,oy,oz,dx,dy,dz,excl,pad
    t_ref,  # VMEM (G, r)
    pid_ref,  # VMEM (G, r) f32
    lights_ref,  # SMEM (k, 4): x, y, z, strength (headlight first)
    *out_refs,  # k shadow payloads (8, G, r), k caps (G, r),
    # k contribution masks (G, r), [next (8, G, r)]
    num_lights: int,
    emit_next: bool,
):
    k = num_lights
    sh_refs = out_refs[:k]
    cap_refs = out_refs[k : 2 * k]
    mask_refs = out_refs[2 * k : 3 * k]
    next_ref = out_refs[3 * k] if emit_next else None
    sg0 = pl.program_id(0) * (TILE_GROUP // SUBGROUP)

    def body(sg, _):
        g0 = sg * SUBGROUP
        compute, dead = _pre_subgroup(
            g0, rows_ref, pay_ref, t_ref, pid_ref, lights_ref,
            sh_refs, cap_refs, mask_refs, next_ref, k, emit_next,
        )
        jax.lax.cond(live_ref[sg0 + sg] > 0, compute, dead)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP // SUBGROUP, body, 0)


def _shade_post_kernel(
    live_ref,  # SMEM [T // SUBGROUP] int32
    rows_ref,  # VMEM (32, G, r)
    pay_ref,  # VMEM (8, G, r): this bounce's rays (d -> specular)
    t_ref,  # VMEM (G, r)
    active_ref,  # VMEM (G, r) f32 (1.0 = live)
    sh_t_ref,  # VMEM (k, G, r): shadow hit t per light — or, in
    # blocked_mode, the any-hit kernel's blocked mask as f32
    sh_id_ref,  # VMEM (k, G, r) f32: shadow hit prim per light
    cap_ref,  # VMEM (k, G, r) f32: shade_pre's light distances — THE
    # occlusion bound; reused here so the closest-hit shadow verdict
    # compares against the same value the any-hit kernel capped with
    # (no cross-kernel FMA-contraction drift)
    lights_ref,  # SMEM (k, 4)
    out_ref,  # VMEM (3, G, r): color contribution
    *,
    num_lights: int,
    first_bounce: bool,
    t_min: float,
    t_max: float,
    blocked_mode: bool = False,
):
    k = num_lights
    sg0 = pl.program_id(0) * (TILE_GROUP // SUBGROUP)

    def body(sg, _):
        g0 = sg * SUBGROUP
        compute, dead = _post_subgroup(
            g0, rows_ref, pay_ref, t_ref, active_ref, sh_t_ref,
            sh_id_ref, cap_ref, lights_ref, out_ref,
            k, first_bounce, t_min, t_max, blocked_mode,
        )
        jax.lax.cond(live_ref[sg0 + sg] > 0, compute, dead)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP // SUBGROUP, body, 0)


def _post_subgroup(
    g0,
    rows_ref, pay_ref, t_ref, active_ref, sh_t_ref, sh_id_ref, cap_ref,
    lights_ref, out_ref,
    k: int,
    first_bounce: bool,
    t_min: float,
    t_max: float,
    blocked_mode: bool,
):
    """One subgroup of the shade_post computation (shadow verdicts +
    Blinn/Phong accumulation); shared by the standalone post kernel and
    the fused bounce kernel."""

    def compute():
        C = lambda c: rows_ref[c, pl.ds(g0, SUBGROUP), :]
        o = tuple(pay_ref[c, pl.ds(g0, SUBGROUP), :] for c in range(3))
        d = tuple(
            pay_ref[c, pl.ds(g0, SUBGROUP), :] for c in range(3, 6)
        )
        t = t_ref[pl.ds(g0, SUBGROUP), :]
        active = active_ref[pl.ds(g0, SUBGROUP), :] > 0.0
        (hx, hy, hz), (nx, ny, nz) = _hit_normal(C, o, d, t)
        dx, dy, dz = d
        spec_pow = C(24)

        diffuse = jnp.zeros_like(t)
        spec = jnp.zeros_like(t)
        for li in range(k):
            lx = lights_ref[li, 0]
            ly = lights_ref[li, 1]
            lz = lights_ref[li, 2]
            ls = lights_ref[li, 3]
            ddx, ddy, ddz = lx - hx, ly - hy, lz - hz
            s = ddx * ddx + ddy * ddy + ddz * ddz
            inv = jax.lax.rsqrt(s)
            ux, uy, uz = ddx * inv, ddy * inv, ddz * inv
            if blocked_mode:
                # The any-hit kernel already applied the full
                # occlusion predicate per ray.
                shadowed = sh_t_ref[li, pl.ds(g0, SUBGROUP), :] > 0.0
            else:
                dist = cap_ref[li, pl.ds(g0, SUBGROUP), :]
                sh_t = sh_t_ref[li, pl.ds(g0, SUBGROUP), :]
                sh_id = sh_id_ref[li, pl.ds(g0, SUBGROUP), :]
                shadowed = (
                    (sh_id != 0.0)
                    & (sh_t < t_max)
                    & (sh_t > t_min)
                    & (sh_t < dist)
                )
            lit = (~shadowed) & (ls > 0.0)
            # diffuse (compute.wgsl:160-166)
            dterm = ls * jnp.maximum(0.0, ux * nx + uy * ny + uz * nz)
            # specular via reflect(-u, n) (compute.wgsl:168-175)
            eux, euy, euz = -ux, -uy, -uz
            den = eux * nx + euy * ny + euz * nz
            rx = eux - 2.0 * den * nx
            ry = euy - 2.0 * den * ny
            rz = euz - 2.0 * den * nz
            sdot = (-rx) * dx + (-ry) * dy + (-rz) * dz
            sterm = (
                jnp.power(jnp.maximum(0.0, sdot), spec_pow) * ls
            )
            diffuse = diffuse + jnp.where(lit, dterm, 0.0)
            spec = spec + jnp.where(lit, sterm, 0.0)

        alb_x = C(21)
        alb_y = C(22)
        da = diffuse * alb_x
        sa = spec * alb_y
        scale = (
            jnp.float32(1.0) if first_bounce else C(23)
        )  # albedo.z attenuation for bounce > 0 (compute.wgsl:258-265)
        for c in range(3):
            contrib = (C(18 + c) * da + sa) * scale
            out_ref[c, pl.ds(g0, SUBGROUP), :] = jnp.where(
                active, contrib, 0.0
            )

    def dead():
        z8 = jnp.zeros((SUBGROUP, t_ref.shape[1]), dtype=jnp.float32)
        for c in range(3):
            out_ref[c, pl.ds(g0, SUBGROUP), :] = z8

    return compute, dead


def _shade_bounce_kernel(
    live_ref,  # SMEM [2, T // SUBGROUP] int32: row 0 = bounce b live,
    # row 1 = bounce b+1 live (scalar prefetch)
    rows_ref,  # post: (32, G, r) bounce b rows
    pay_ref,  # post: (8, G, r) bounce b rays
    t_ref,  # post: (G, r)
    active_ref,  # post: (G, r) f32
    sh_t_ref,  # post: (k, G, r)
    sh_id_ref,  # post: (k, G, r)
    cap_ref,  # post: (k, G, r)
    rows2_ref,  # pre: (32, G, r) bounce b+1 rows
    pay2_ref,  # pre: (8, G, r) bounce b+1 rays
    t2_ref,  # pre: (G, r)
    pid2_ref,  # pre: (G, r) f32
    lights_ref,  # SMEM (k, 4)
    *out_refs,  # color (3,G,r), k shadow pays, k caps, k masks,
    # [next (8,G,r)]
    num_lights: int,
    first_bounce: bool,
    t_min: float,
    t_max: float,
    blocked_mode: bool,
    emit_next: bool,
):
    """Fused shade_post(bounce b) + shade_pre(bounce b+1).

    The two halves share no data (post consumes bounce b's shadow
    results, pre consumes bounce b+1's hit) but both become available
    after the same intersect call, so fusing them halves the per-bounce
    shading kernel launches.  MEASURED on TPU: flat at 384x288, ~+0.5 ms
    at 640x480/1080p, ~+0.4 ms on the blank overhead probe — in-graph
    launches are cheaper than the fused kernel's pipelining loss, so
    trace_tiled defaults to the two-kernel path (PERF.md round 3)."""
    k = num_lights
    color_ref = out_refs[0]
    sh_refs = out_refs[1 : 1 + k]
    cap_out_refs = out_refs[1 + k : 1 + 2 * k]
    mask_refs = out_refs[1 + 2 * k : 1 + 3 * k]
    next_ref = out_refs[1 + 3 * k] if emit_next else None
    sg0 = pl.program_id(0) * (TILE_GROUP // SUBGROUP)

    def body(sg, _):
        g0 = sg * SUBGROUP
        post_c, post_d = _post_subgroup(
            g0, rows_ref, pay_ref, t_ref, active_ref, sh_t_ref,
            sh_id_ref, cap_ref, lights_ref, color_ref,
            k, first_bounce, t_min, t_max, blocked_mode,
        )
        jax.lax.cond(live_ref[0, sg0 + sg] > 0, post_c, post_d)
        pre_c, pre_d = _pre_subgroup(
            g0, rows2_ref, pay2_ref, t2_ref, pid2_ref, lights_ref,
            sh_refs, cap_out_refs, mask_refs, next_ref, k, emit_next,
        )
        jax.lax.cond(live_ref[1, sg0 + sg] > 0, pre_c, pre_d)
        return 0

    jax.lax.fori_loop(0, TILE_GROUP // SUBGROUP, body, 0)


def shade_bounce(
    rows,  # [32, T, r] bounce b rows
    payload,  # [8, T, r] bounce b rays
    t,  # [T, r]
    active_f,  # [T, r] f32
    sh_t,  # [k, T, r] (or blocked mask in blocked_mode)
    sh_id_f,  # [k, T, r]
    caps,  # [k, T, r]
    rows2,  # [32, T, r] bounce b+1 rows
    payload2,  # [8, T, r] bounce b+1 rays
    t2,  # [T, r]
    pid2_f,  # [T, r] f32
    live_sg2,  # [2, T // SUBGROUP] int32 (bounce b row 0, b+1 row 1)
    lights,  # [k, 4]
    first_bounce: bool,
    t_min: float,
    t_max: float,
    emit_next: bool,
    interpret: bool = False,
    blocked_mode: bool = False,
):
    """-> (color contribution [3,T,r] for bounce b,
    shadow payloads [k][8,T,r], caps [k][T,r], contribution masks
    [k][T,r], next [8,T,r]|None for bounce b+1) — one kernel instead
    of post + pre."""
    k = int(lights.shape[0])
    t_tiles, r = t.shape
    (
        t_groups, rows_spec, pay_spec, tr_spec, lights_spec, ktr_spec
    ) = _grid_specs(t_tiles, r, k)
    color_spec = pl.BlockSpec((3, TILE_GROUP, r), lambda t, *_: (0, t, 0))
    out_shapes = (
        [jax.ShapeDtypeStruct((3, t_tiles, r), jnp.float32)]
        + [jax.ShapeDtypeStruct((8, t_tiles, r), jnp.float32)] * k
        + [jax.ShapeDtypeStruct((t_tiles, r), jnp.float32)] * (2 * k)
        + (
            [jax.ShapeDtypeStruct((8, t_tiles, r), jnp.float32)]
            if emit_next
            else []
        )
    )
    out_specs = (
        [color_spec]
        + [pay_spec] * k
        + [tr_spec] * (2 * k)
        + ([pay_spec] if emit_next else [])
    )
    kernel = partial(
        _shade_bounce_kernel,
        num_lights=k,
        first_bounce=first_bounce,
        t_min=t_min,
        t_max=t_max,
        blocked_mode=blocked_mode,
        emit_next=emit_next,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[
            rows_spec, pay_spec, tr_spec, tr_spec, ktr_spec, ktr_spec,
            ktr_spec, rows_spec, pay_spec, tr_spec, tr_spec, lights_spec,
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        live_sg2, rows, payload, t, active_f, sh_t, sh_id_f, caps,
        rows2, payload2, t2, pid2_f, lights,
    )
    color = outs[0]
    sh = outs[1 : 1 + k]
    cap_out = outs[1 + k : 1 + 2 * k]
    masks = outs[1 + 2 * k : 1 + 3 * k]
    nxt = outs[1 + 3 * k] if emit_next else None
    return color, sh, cap_out, masks, nxt


def _grid_specs(t_tiles: int, r: int, k: int):
    t_groups = t_tiles // TILE_GROUP
    G = TILE_GROUP
    rows_spec = pl.BlockSpec((32, G, r), lambda t, *_: (0, t, 0))
    pay_spec = pl.BlockSpec((8, G, r), lambda t, *_: (0, t, 0))
    tr_spec = pl.BlockSpec((G, r), lambda t, *_: (t, 0))
    lights_spec = pl.BlockSpec(
        (k, 4), lambda t, *_: (0, 0), memory_space=pltpu.SMEM
    )
    ktr_spec = pl.BlockSpec((k, G, r), lambda t, *_: (0, t, 0))
    return t_groups, rows_spec, pay_spec, tr_spec, lights_spec, ktr_spec


def shade_pre(
    rows,  # [32, T, r] f32 gathered shade-table columns
    payload,  # [8, T, r] f32 current rays
    t,  # [T, r] f32
    pid_f,  # [T, r] f32
    live_sg,  # [T // SUBGROUP] int32 per-subgroup any-live
    lights,  # [k, 4] f32 (pos xyz, strength); headlight first if any
    emit_next: bool,
    interpret: bool = False,
):
    """-> (shadow payloads [k][8,T,r], caps [k][T,r],
    contribution masks [k][T,r] f32 1.0/0.0, next [8,T,r]|None).

    A mask of 0.0 means this light cannot contribute to the ray's
    color whatever the shadow verdict is (back-facing diffuse AND
    zero specular) — the caller drops those shadow rays from the
    intersect batch (zero-contribution shadow cull)."""
    k = int(lights.shape[0])
    t_tiles, r = t.shape
    (
        t_groups, rows_spec, pay_spec, tr_spec, lights_spec, _
    ) = _grid_specs(t_tiles, r, k)
    out_shapes = (
        [jax.ShapeDtypeStruct((8, t_tiles, r), jnp.float32)] * k
        + [jax.ShapeDtypeStruct((t_tiles, r), jnp.float32)] * (2 * k)
        + ([jax.ShapeDtypeStruct((8, t_tiles, r), jnp.float32)] if emit_next else [])
    )
    out_specs = (
        [pay_spec] * k
        + [tr_spec] * (2 * k)
        + ([pay_spec] if emit_next else [])
    )
    kernel = partial(
        _shade_pre_kernel, num_lights=k, emit_next=emit_next
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[rows_spec, pay_spec, tr_spec, tr_spec, lights_spec],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(live_sg, rows, payload, t, pid_f, lights)
    sh = outs[:k]
    caps = outs[k : 2 * k]
    masks = outs[2 * k : 3 * k]
    nxt = outs[3 * k] if emit_next else None
    return sh, caps, masks, nxt


def shade_post(
    rows,  # [32, T, r]
    payload,  # [8, T, r] this bounce's rays
    t,  # [T, r]
    active_f,  # [T, r] f32 (1.0 = live)
    sh_t,  # [k, T, r] — or the any-hit blocked mask (f32) in blocked_mode
    sh_id_f,  # [k, T, r] f32 (ignored in blocked_mode)
    caps,  # [k, T, r] f32 shade_pre's light distances (occlusion bound)
    live_sg,  # [T // SUBGROUP] int32
    lights,  # [k, 4]
    first_bounce: bool,
    t_min: float,
    t_max: float,
    interpret: bool = False,
    blocked_mode: bool = False,
):
    """-> color contribution [3, T, r] (active-masked, scaled)."""
    k = int(lights.shape[0])
    t_tiles, r = t.shape
    (
        t_groups, rows_spec, pay_spec, tr_spec, lights_spec, ktr_spec
    ) = _grid_specs(t_tiles, r, k)
    kernel = partial(
        _shade_post_kernel,
        num_lights=k,
        first_bounce=first_bounce,
        t_min=t_min,
        t_max=t_max,
        blocked_mode=blocked_mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_groups,),
        in_specs=[
            rows_spec, pay_spec, tr_spec, tr_spec, ktr_spec, ktr_spec,
            ktr_spec, lights_spec,
        ],
        out_specs=pl.BlockSpec((3, TILE_GROUP, r), lambda t, *_: (0, t, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, t_tiles, r), jnp.float32),
        interpret=interpret,
    )(live_sg, rows, payload, t, active_f, sh_t, sh_id_f, caps, lights)
