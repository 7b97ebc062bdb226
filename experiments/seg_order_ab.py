"""Segment visit order vs cap-chain pruning (round-5, after the
segmented roofline).

The roofline showed every per-segment MT kernel at the plain-closest
speed-of-light (0.38-0.40 us/entry) with cap chaining pruning only
6.2% (canyon) / 10.5% (teapots3) of entries — so segment ORDER is the
only remaining knob on the segmented path's entry count.  This
measures, per closest call, the chained entry totals under:

* ``scene``  — the production order (segment index = leaf order);
* ``ftb``    — front-to-back by camera distance to segment AABB center
               (what a per-frame reorder would visit);
* ``btf``    — back-to-front (the adversarial order);
* ``ideal``  — the unreachable bound: every segment culled with the
               FINAL per-ray best-t as cap (what an oracle that knew
               the answer before visiting any segment would pay).
               NO ordering scheme can beat this.

If ideal - scene is small, per-frame segment reordering (which would
force a stacked-segment lax.scan restructure of
``packet_closest_hit_segmented_tiled``) is rejected with a bound, not
a vibe.  Counting only — entries x the measured 0.39 us/entry rate
converts to ms.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/seg_order_ab.py [scene]
scene: canyon | teapots3 | both (default both)
"""

import sys

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

sys.path.insert(0, "/root/repo/experiments")
from measure_round3 import big_scene  # noqa: E402

WHICH = sys.argv[1] if len(sys.argv) > 1 else "both"
W, H = 640, 480
RAY_TILE = 256
US_PER_ENTRY = 0.39  # measured (experiments/roofline_seg.py round 5)


def make_counting_frame(scene, w, h):
    cfg = ComputeConfig()
    handler = get_handler("pbvh")
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    assert isinstance(accel, SegmentedTriChunks)
    segs = accel.segments
    bases = accel.prim_base
    n_seg = len(segs)
    kwk = dict(t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps,
               interpret=False)

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

    record = []  # per closest call: dict(order -> [per-seg entries])

    def closest(payload, valid, t_cap=None, refine=False):
        # One REAL pass in scene order for the production result (and
        # the final best-t), with counting taps for every order.
        counts = {k: [None] * n_seg for k in ("scene", "ftb", "btf",
                                              "ideal")}
        best_t = best_id = None
        for s, (base, cs) in enumerate(zip(bases, segs)):
            cap_s = t_cap
            if best_t is not None:
                cap_s = (best_t if cap_s is None
                         else jnp.minimum(cap_s, best_t))
            counts["scene"][s] = seg_entries(payload, valid, cap_s,
                                             refine, s)
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
        # Ideal: every segment culled with the final best-t.
        cap_f = (best_t if t_cap is None
                 else jnp.minimum(t_cap, best_t))
        for s in range(n_seg):
            counts["ideal"][s] = seg_entries(payload, valid, cap_f,
                                             refine, s)
        # Ordered replays (front-to-back / back-to-front): re-walk the
        # chain in the given static order, reusing per-segment results
        # from cheap re-calls (counting only needs the running best,
        # which the kernel recomputes; XLA CSEs the scene-order calls
        # above where caps coincide).
        for key, order in (("ftb", ftb_order), ("btf", btf_order)):
            bt = None
            for s in order:
                cap_s = t_cap
                if bt is not None:
                    cap_s = (bt if cap_s is None
                             else jnp.minimum(cap_s, bt))
                counts[key][s] = seg_entries(payload, valid, cap_s,
                                             refine, s)
                t_s, _ = packet_closest_hit_tiled(
                    segs[s], payload, valid, cap_s, pid_base=bases[s],
                    refine=refine, **kwk,
                )
                bt = t_s if bt is None else jnp.minimum(bt, t_s)
        record.append(counts)
        return best_t, best_id

    closest.supports_refine = True

    # Host-side front-to-back order for THIS scene's camera (static
    # under jit, which is exactly what a real implementation could NOT
    # have without a recompile or a stacked-segment restructure — this
    # experiment buys the number without the restructure).
    cam = np.asarray(scene.camera.pos, np.float32)
    centers = [
        (np.asarray(s.bmin).min(0) + np.asarray(s.bmax).max(0)) / 2
        for s in segs
    ]
    dist = [float(np.linalg.norm(c - cam)) for c in centers]
    ftb_order = list(np.argsort(dist))
    btf_order = ftb_order[::-1]
    print(f"  segment order ftb={ftb_order}")

    blk = Config(resolution=Resolution.sized(w, h)).resolution.block(
        RAY_TILE
    )

    @jax.jit
    def jfr(pos, at):
        record.clear()
        payload, valid, _ = shade.camera_ray_tiles(
            pos, at, w, h, RAY_TILE, block=blk
        )
        shade.trace_tiled(arrays, closest, cfg, payload, valid, pos,
                          interpret=False)
        return {
            k: jnp.stack([jnp.stack(c[k]) for c in record])
            for k in record[0]
        }

    return jfr


def run_scene(name, scene):
    scene.camera = scene.camera.orbited(25.0)
    jfr = make_counting_frame(scene, W, H)
    out = jfr(
        jnp.asarray(scene.camera.pos, jnp.float32),
        jnp.asarray(scene.camera.at, jnp.float32),
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    print(f"\n=== {name} @ {W}x{H} ({out['scene'].shape[0]} closest "
          f"calls x {out['scene'].shape[1]} segments)")
    tot = {k: int(v.sum()) for k, v in out.items()}
    base = tot["scene"]
    for k in ("scene", "ftb", "btf", "ideal"):
        print(
            f"  {k:>6}: {tot[k]:8d} entries "
            f"({(base - tot[k]) / base * 100:+6.2f}% vs scene order, "
            f"~{tot[k] * US_PER_ENTRY / 1e3:6.2f} ms at "
            f"{US_PER_ENTRY} us/entry)"
        )
    percall = {k: v.sum(1) for k, v in out.items()}
    for i in range(len(percall["scene"])):
        print(
            "    call {}: scene {} ftb {} btf {} ideal {}".format(
                i, *(int(percall[k][i])
                     for k in ("scene", "ftb", "btf", "ideal"))
            )
        )


def main():
    if WHICH in ("canyon", "both"):
        run_scene("canyon (8 teapots, 50K tris)", big_scene())
    if WHICH in ("teapots3", "both"):
        from rt_rs_tpu.scene import presets

        run_scene("teapots3 (18,960 prims)", presets.tiled_teapots(3))


if __name__ == "__main__":
    main()
