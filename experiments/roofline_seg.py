"""Roofline / entry accounting for the SEGMENTED (beyond-VMEM) path
(VERDICT round-4 task 1).

The round-4 roofline covered only the resident teatime path; this is
its segmented twin, on the 50K-tri 8-teapot canyon (640x480) and the
teapots3 preset.  Same methodology as experiments/roofline.py:

1. practical VPU peak (imported) as the speed-of-light reference;
2. a counting frame that REPLICATES the production segmented loop
   (``packet_closest_hit_segmented_tiled`` — per-segment kernels with
   cross-segment cap chaining) while recording each segment's culled
   chunk-list entry count under the REAL chained caps, plus the
   unchained counts for the same call (cap-chain effectiveness);
3. jax.profiler device totals of the per-segment MT kernel dispatches,
   paired to the counting record in program order.

Derived per (call, segment): us/entry and % of the practical peak —
whether the large-scene story runs at the resident path's
0.57 us/entry, and how much the chained caps prune per bounce.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/roofline_seg.py [scene]
scene: canyon | teapots3 | both (default canyon)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.ops.pallas.packet_trace import (
    REFINE_SUB,
    SegmentedTriChunks,
    _perray_overlap_kernel_call,
    chunk_overlap_mask_cm,
    chunk_overlap_mask_subgroup_cm,
    packet_closest_hit_tiled,
)
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

sys.path.insert(0, "/root/repo/experiments")
from measure_round3 import big_scene  # noqa: E402
from roofline import OPS_PER_SLOT, mt_kernel_ms, practical_peak  # noqa: E402

WHICH = sys.argv[1] if len(sys.argv) > 1 else "canyon"
W, H = 640, 480
RAY_TILE = 256


def make_seg_counting_frame(scene, w, h):
    """A jitted frame fn over the segmented gather path (the
    production default for beyond-VMEM scenes) that ALSO returns, per
    intersect call and per segment, the culled entry count under the
    chained cap and under the unchained cap.  The per-segment counts
    re-run the same overlap functions the kernel prelude computes, so
    under jit they CSE with the real prelude (near-zero extra cost).
    """
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    assert isinstance(accel, SegmentedTriChunks), "scene not segmented"
    segs = accel.segments
    bases = accel.prim_base
    kwk = dict(
        t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps, interpret=False
    )

    record = []  # (kind, [chained per-seg], [unchained per-seg], live)

    def seg_entries(payload, valid, t_cap, refine, s):
        inv3 = 1.0 / payload[3:6]
        kw = dict(t_min=cfg.t_min, t_max=cfg.t_max, t_cap=t_cap)
        bmin, bmax = segs[s].bmin, segs[s].bmax
        if refine:
            n_sub = REFINE_SUB if refine is True else int(refine)
            if n_sub == 1:
                overlap = _perray_overlap_kernel_call(
                    payload, valid, bmin, bmax, interpret=False, **kw
                )
            else:
                overlap = chunk_overlap_mask_subgroup_cm(
                    payload[0:3], inv3, valid, bmin, bmax, sub=n_sub, **kw
                )
        else:
            overlap = chunk_overlap_mask_cm(
                payload[0:3], inv3, valid, bmin, bmax, **kw
            )
        return jnp.sum(overlap, dtype=jnp.int32)

    def closest(payload, valid, t_cap=None, refine=False):
        # Mirror of packet_closest_hit_segmented_tiled (chain=True,
        # gather mode) with counting taps.
        best_t = best_id = None
        chained, unchained = [], []
        for s, (base, cs) in enumerate(zip(bases, segs)):
            cap_s = t_cap
            if best_t is not None:
                cap_s = (
                    best_t if cap_s is None
                    else jnp.minimum(cap_s, best_t)
                )
            chained.append(seg_entries(payload, valid, cap_s, refine, s))
            unchained.append(seg_entries(payload, valid, t_cap, refine, s))
            t_s, id_s = packet_closest_hit_tiled(
                cs, payload, valid, cap_s, pid_base=base, refine=refine,
                **kwk,
            )
            if best_t is None:
                best_t, best_id = t_s, id_s
            else:
                better = t_s < best_t
                best_t = jnp.where(better, t_s, best_t)
                best_id = jnp.where(better, id_s, best_id)
        record.append(
            ("closest", chained, unchained,
             jnp.sum(valid, dtype=jnp.int32))
        )
        return best_t, best_id

    closest.supports_refine = True

    blk = Config(
        resolution=Resolution.sized(w, h)
    ).resolution.block(RAY_TILE)

    kinds_cell = []

    @jax.jit
    def jfr(pos, at):
        record.clear()
        payload, valid, n_pixels = shade.camera_ray_tiles(
            pos, at, w, h, RAY_TILE, block=blk
        )
        color = shade.trace_tiled(
            arrays, closest, cfg, payload, valid, pos, interpret=False
        )
        ch = jnp.stack([jnp.stack(c) for _, c, _, _ in record])
        un = jnp.stack([jnp.stack(u) for _, _, u, _ in record])
        lives = jnp.stack([v for _, _, _, v in record])
        if not kinds_cell:
            kinds_cell.extend(k for k, _, _, _ in record)
        return color, ch, un, lives

    return jfr, kinds_cell, accel, int(segs[0].comp.shape[1])


def run_scene(name, scene, peak):
    scene.camera = scene.camera.orbited(25.0)  # side-on worst view
    jfr, kinds_cell, accel, tc = make_seg_counting_frame(scene, W, H)
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)
    color, ch, un, lives = jfr(pos, at)
    ch = np.asarray(ch)  # [calls, n_seg]
    un = np.asarray(un)
    lives = np.asarray(lives)
    n_seg = ch.shape[1]
    seg_chunks = [s.num_chunks for s in accel.segments]
    print(
        f"\n=== {name} @ {W}x{H}: {len(kinds_cell)} calls x {n_seg} "
        f"segments (chunks/seg {seg_chunks}, tc={tc})"
    )
    print(
        f"cap-chain effectiveness: chained {int(ch.sum())} entries vs "
        f"unchained {int(un.sum())} "
        f"({(1 - ch.sum() / max(un.sum(), 1)) * 100:.1f}% pruned)"
    )

    closest_ms, anyhit_ms, total_dev = mt_kernel_ms(scene, W, H)
    mt_total = sum(d for _, d in closest_ms + anyhit_ms)
    print(
        f"MT kernel device time {mt_total:.3f} ms/frame of "
        f"{total_dev:.3f} total ({len(closest_ms)} closest events, "
        f"{len(anyhit_ms)} anyhit)"
    )
    ev = iter(closest_ms)
    total_entries = 0
    for i in range(ch.shape[0]):
        for s in range(n_seg):
            e = int(ch[i, s])
            total_entries += e
            try:
                n, d = next(ev)
            except StopIteration:
                print(f"  call {i} seg {s}: no kernel event")
                continue
            us_e = d * 1e3 / max(e, 1)
            achieved = e * tc * RAY_TILE * OPS_PER_SLOT / max(d * 1e-3, 1e-9)
            print(
                f"  call {i} seg {s} ({n.rsplit('.', 1)[-1]:>3}): "
                f"{d:7.3f} ms, {e:6d} ent (unchained {int(un[i, s]):6d}), "
                f"live {int(lives[i]):7d} -> {us_e:6.3f} us/entry, "
                f"{achieved / peak * 100:5.1f}% of peak"
            )
    if total_entries:
        print(
            f"{name}: total {total_entries} entries, "
            f"{mt_total * 1e3 / total_entries:.3f} us/entry overall "
            f"(resident reference: 0.57 closest / 0.39 anyhit)"
        )


def main():
    peak = practical_peak()
    print(f"practical VPU peak: {peak / 1e12:.3f} Tflop/s f32")
    if WHICH in ("canyon", "both"):
        run_scene("canyon (8 teapots, 50K tris)", big_scene(), peak)
    if WHICH in ("teapots3", "both"):
        from rt_rs_tpu.scene import presets

        run_scene("teapots3 (18,960 prims)", presets.tiled_teapots(3), peak)


if __name__ == "__main__":
    main()
