"""MFU / roofline accounting for the MT packet kernel (VERDICT r3 #4).

Three measurements on the real TPU, one session:

1. **Practical VPU peak**: a synthetic Pallas kernel running a long
   f32 FMA chain on resident VMEM blocks — the elementwise
   speed-of-light this chip/toolchain actually reaches (no memory
   traffic after the first block, no kernel cleverness to discount).
2. **Entries per frame**: the production frame re-run with a counting
   wrapper around the handler's intersect fns that reproduces the
   kernel's REAL cull (interval for primaries, per-ray subgroup refine
   for bounce/shadow — the same branch packet_closest_hit_tiled takes)
   and returns each call's culled chunk-list entry total as an extra
   jit output.
3. **Kernel time per frame**: jax.profiler device totals for the MT
   kernel dispatches (the same decomposition trace_small_frame.py
   prints).

Derived: achieved VPU FLOP/s of the closest-hit kernel
(entries x tri_chunk x ray_tile slots x ~68 lattice ops/slot / time),
its fraction of the synthetic peak, and us/entry — the fixed-cost
framing PERF.md has used since round 3.  Lattice-op count: audited
from mt_chunk_test + chunk_body (two crosses 18, tvec 3, three dots
15, sign-fold 4, 8 compares, 7 ands, 3 selects, 1 div, pid 2,
closest-update 4 = 65; call it 68 with the loop's id arithmetic).

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/roofline.py [sizes]
sizes: small | 1080 | both (default both)
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.pallas.packet_trace import (
    REFINE_SUB,
    _perray_overlap_kernel_call,
    chunk_overlap_mask_cm,
    chunk_overlap_mask_subgroup_cm,
)
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"
OPS_PER_SLOT = 68.0
PART = sys.argv[1] if len(sys.argv) > 1 else "both"


# ---------------------------------------------------------------------
# 1. synthetic practical peak


_PEAK_CHAINS = 16  # independent vreg-sized accumulator chains


def _fma_kernel(x_ref, o_ref, *, iters):
    """``_PEAK_CHAINS`` independent (8, 128) FMA chains.  The first
    version of this kernel carried the whole (256, 512) block through
    the loop — that carry spills to VMEM every iteration, so it
    measured VMEM bandwidth (0.62 Tflop/s), not compute.  A few
    register-resident independent chains pipeline the FMA latency
    away and measure the actual VPU issue rate."""
    accs = tuple(
        x_ref[8 * i : 8 * (i + 1), :] + jnp.float32(i)
        for i in range(_PEAK_CHAINS)
    )

    def body(_, accs):
        return tuple(
            a * jnp.float32(0.999999) + jnp.float32(1e-7) for a in accs
        )

    accs = jax.lax.fori_loop(0, iters, body, accs)
    out = accs[0]
    for a in accs[1:]:
        out = out + a
    o_ref[...] = out


def practical_peak() -> float:
    """Achieved f32 FLOP/s of independent register-resident FMA
    chains — 2 flops per element-iteration per chain."""
    iters, grid = 4096, 256
    rows, cols = 8 * _PEAK_CHAINS, 128
    x = jnp.ones((grid * rows, cols), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            partial(_fma_kernel, iters=iters),
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((grid * 8, cols), x.dtype),
        )(x)
    )
    device_sync(fn(x))  # compile + warm
    reps = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(x)
    device_sync(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * iters * _PEAK_CHAINS * 8 * cols * grid
    return flops / dt


# ---------------------------------------------------------------------
# 2. entries per frame (the production cull, replayed for counting)


def make_counting_frame(scene, w, h):
    """A jitted frame fn returning (color, per-call entry counts,
    per-call live-ray counts).  Wraps the pbvh handler's tiled fns;
    the count reproduces packet_closest_hit_tiled's cull exactly
    (same granularity, caps, and refine branch)."""
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    base_i = handler.intersect_tiled_fn(accel, arrays, cfg)
    base_r = handler.intersect_tiled_rows_fn(accel, arrays, cfg)
    base_a = handler.intersect_tiled_anyhit_fn(accel, arrays, cfg)
    # tag_refine returns the partial(packet_closest_hit_tiled, chunks,
    # ...) itself for the resident teatime case — chunks is positional
    # arg 0, cull_block the source default unless overridden.
    from rt_rs_tpu.ops.pallas.packet_trace import CULL_BLOCK

    chunks = base_i.args[0]
    cull_block = base_i.keywords.get("cull_block", CULL_BLOCK)
    tc = int(chunks.comp.shape[1])

    nb = chunks.num_chunks // cull_block
    if cull_block > 1:
        blk_min = jnp.min(chunks.bmin.reshape(nb, cull_block, 3), axis=1)
        blk_max = jnp.max(chunks.bmax.reshape(nb, cull_block, 3), axis=1)
    else:
        blk_min, blk_max = chunks.bmin, chunks.bmax

    record = []  # (kind, entries, live) traced scalars

    def count(payload, valid, t_cap, refine):
        inv3 = 1.0 / payload[3:6]
        kw = dict(t_min=cfg.t_min, t_max=cfg.t_max, t_cap=t_cap)
        if refine:
            n_sub = REFINE_SUB if refine is True else int(refine)
            if n_sub == 1:
                overlap = _perray_overlap_kernel_call(
                    payload, valid, blk_min, blk_max,
                    interpret=False, **kw,
                )
            else:
                overlap = chunk_overlap_mask_subgroup_cm(
                    payload[0:3], inv3, valid, blk_min, blk_max,
                    sub=n_sub, **kw,
                )
        else:
            overlap = chunk_overlap_mask_cm(
                payload[0:3], inv3, valid, blk_min, blk_max, **kw
            )
        return (
            jnp.sum(overlap, dtype=jnp.int32) * cull_block,
            jnp.sum(valid, dtype=jnp.int32),
        )

    def wrap(base, kind):
        def fn(payload, valid, t_cap=None, refine=False):
            e, live = count(payload, valid, t_cap, refine)
            record.append((kind, e, live))
            return base(payload, valid, t_cap=t_cap, refine=refine)

        fn.supports_refine = True
        return fn

    blk = Config(resolution=Resolution.sized(w, h)).resolution.block(256)

    def frame(pos, at):
        record.clear()
        payload, valid, n_pixels = shade.camera_ray_tiles(
            pos, at, w, h, 256, block=blk
        )
        color = shade.trace_tiled(
            arrays, wrap(base_i, "closest"), cfg, payload, valid, pos,
            interpret=False,
            intersect_rows_fn=wrap(base_r, "rows"),
            intersect_anyhit_fn=wrap(base_a, "anyhit"),
        )
        kinds = [k for k, _, _ in record]
        ents = jnp.stack([e for _, e, _ in record])
        lives = jnp.stack([v for _, _, v in record])
        return color, ents, lives, kinds

    # jit via closure: kinds is static (trace-time python), returned
    # through a cell instead of the jitted output.
    kinds_cell = []

    @jax.jit
    def jfr(pos, at):
        color, ents, lives, kinds = frame(pos, at)
        if not kinds_cell:
            kinds_cell.extend(kinds)
        return color, ents, lives

    return jfr, kinds_cell, tc


# ---------------------------------------------------------------------
# 3. MT kernel device time (profiler totals)


def mt_kernel_ms(scene, w, h, frames=10):
    """Per-frame device ms of the MT kernel dispatches, by op-name
    match on the profiler trace."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    from rt_rs_tpu.renderer import Renderer

    r = Renderer(
        scene, config=Config(resolution=Resolution.sized(w, h)),
        handler="pbvh",
    )
    r.camera = scene.camera
    device_sync(r.render_frame(block=False))
    tdir = f"/tmp/jax_trace_roofline_{w}x{h}"
    with jax.profiler.trace(tdir):
        out = None
        for _ in range(frames):
            out = r.render_frame(block=False)
        device_sync(out)
    paths = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    procs = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in procs.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    totals = defaultdict(float)
    longname = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        n = e.get("name", "?")
        totals[n] += e["dur"]
        if n not in longname:
            longname[n] = e.get("args", {}).get("long_name", "")
    # The MT kernels compile as custom-calls named _render_jit.NN; the
    # pallas symbol is NOT in the op name, so classify by the HLO
    # long_name's output-shape signature: the closest-hit(+rows)
    # kernel returns the (t f32[T,1,r], pid s32[T,1,r][, rows
    # f32[32,T,r]]) tuple; the any-hit kernel a single s32[T*L,1,r].
    closest, anyhit = [], []
    for n, d in totals.items():
        ln = longname.get(n, "")
        if " = (f32[" in ln and ", s32[" in ln:
            closest.append((n, d))
        elif " = s32[" in ln and ",1,256]" in ln.split("custom-call")[0]:
            anyhit.append((n, d))

    def order(items):
        # program order = the .NN suffix
        def key(nd):
            try:
                return int(nd[0].rsplit(".", 1)[-1])
            except ValueError:
                return 1 << 30
        return [
            (n, d / frames / 1e3) for n, d in sorted(items, key=key)
        ]

    other = sum(totals.values()) / frames / 1e3
    return order(closest), order(anyhit), other


def main():
    scene = Scene.load(SCENE)
    scene.camera = scene.camera.orbited(25.0)  # side-on worst view

    peak = practical_peak()
    print(f"practical VPU peak (FMA chain): {peak/1e12:.3f} Tflop/s f32")

    sizes = []
    if PART in ("both", "small"):
        sizes.append((384, 288))
    if PART in ("both", "1080"):
        sizes.append((1920, 1080))

    for w, h in sizes:
        jfr, kinds_cell, tc = make_counting_frame(scene, w, h)
        pos = jnp.asarray(scene.camera.pos, jnp.float32)
        at = jnp.asarray(scene.camera.at, jnp.float32)
        color, ents, lives = jfr(pos, at)
        ents = np.asarray(ents)
        lives = np.asarray(lives)
        kinds = list(kinds_cell)
        per_kind = {}
        for k, e in zip(kinds, ents):
            per_kind[k] = per_kind.get(k, 0) + int(e)
        total_entries = int(ents.sum())
        print(
            f"{w}x{h}: {len(kinds)} intersect calls, entries by kind "
            f"{per_kind} (total {total_entries}); live rays per call "
            f"{lives.tolist()}"
        )

        closest_ms, anyhit_ms, total_dev = mt_kernel_ms(scene, w, h)
        mt_total = sum(d for _, d in closest_ms + anyhit_ms)
        print(
            f"{w}x{h}: MT kernel device time {mt_total:.3f} ms/frame "
            f"of {total_dev:.3f} total"
        )
        # Pair per-call: the counting record alternates closest(rows)/
        # anyhit per bounce in program order; the kernel events are in
        # program order by .NN suffix.
        by_kind = {"closest": iter(closest_ms), "rows": iter(closest_ms),
                   "anyhit": iter(anyhit_ms)}
        for i, (kind, e, live) in enumerate(zip(kinds, ents, lives)):
            try:
                n, d = next(by_kind[kind])
            except StopIteration:
                print(f"  call {i} {kind}: no kernel event matched")
                continue
            e = int(e)
            us_e = d * 1e3 / max(e, 1)
            slots = e * tc * 256
            achieved = slots * OPS_PER_SLOT / max(d * 1e-3, 1e-9)
            print(
                f"  call {i} {kind:>7} ({n.rsplit('.', 1)[-1]:>3}): "
                f"{d:7.3f} ms, {e:6d} entries, {int(live):7d} live -> "
                f"{us_e:6.3f} us/entry, {achieved/1e12:5.2f} Tflop/s "
                f"({achieved/peak*100:5.1f}% of peak)"
            )

        slots = total_entries * tc * 256
        ops = slots * OPS_PER_SLOT
        achieved = ops / max(mt_total * 1e-3, 1e-9)
        print(
            f"{w}x{h}: {slots/1e6:.1f}M slots/frame, "
            f"{achieved/1e12:.3f} Tflop/s achieved = "
            f"{achieved/peak*100:.1f}% of practical peak; "
            f"{mt_total*1e3/max(total_entries,1):.3f} us/entry"
        )


if __name__ == "__main__":
    main()
