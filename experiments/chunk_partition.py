"""Chunk-partition study: can tighter 64-tri chunks cut kernel entries?

The packet kernel's cost is ~0.4 us per culled chunk-list entry
(PERF.md round 3), and chunks are fixed 64-runs of the BVH leaf (DFS)
order — runs can straddle subtree boundaries, so their AABBs union
unrelated geometry.  This experiment (CPU, exact production batches):

1. records every intersect call of a teatime frame by running the
   production ``trace_tiled`` eagerly with a recording brute-force
   intersector (gather mode + shadow cull: exactly the small-frame
   production batch set);
2. counts culled list entries for alternative partitions using the
   REAL cull code (interval for primaries, per-ray for bounce/shadow
   batches = the refine="bounces" production policy);
3. reports a partition-independent floor: per-TRI slab passes, packed
   64-per-chunk per tile (the clairvoyant partition).

Partitions compared:
  cur64      consecutive 64-runs of leaf order (production today)
  dp64[l]    optimal contiguous variable-length runs (<= 64 tris,
             sublane-padded) minimizing sum of chunk-AABB surface
             areas + l * num_chunks, via DP over cut positions
  sub64      subtree-aligned greedy cuts (never straddle a BVH node
             boundary when the node fits in the open chunk)

Run (CPU, ~minutes):  python experiments/chunk_partition.py [W H]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rt_rs_tpu.config import ComputeConfig  # noqa: E402
from rt_rs_tpu.handlers import get_handler  # noqa: E402
from rt_rs_tpu.ops import shade  # noqa: E402
from rt_rs_tpu.ops.intersect import closest_hit_bruteforce  # noqa: E402
from rt_rs_tpu.ops.pallas.packet_trace import (  # noqa: E402
    chunk_overlap_mask_cm,
    chunk_overlap_mask_perray_cm,
)
from rt_rs_tpu.scene import Scene  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 192
H = int(sys.argv[2]) if len(sys.argv) > 2 else 144
TC = 64
SCENE = "/root/reference/scenes/teatime.json"


def record_batches(scene, cfg):
    """Run the production tiled bounce loop eagerly with a brute-force
    intersector that records every call's (payload, valid, cap,
    refine)."""
    h = get_handler("naive")
    arrays = scene.pack()
    accel, arr2 = h.build(scene, arrays)
    pa, pb, pc = (jnp.asarray(x) for x in (arr2.pa, arr2.pb, arr2.pc))
    calls = []

    def fn(payload, valid, t_cap=None, refine=False):
        calls.append(
            dict(
                payload=np.asarray(payload),
                valid=np.asarray(valid),
                cap=None if t_cap is None else np.asarray(t_cap),
                refine=bool(refine),
            )
        )
        t_tiles, r = payload.shape[1], payload.shape[2]
        o = payload[0:3].reshape(3, -1).T
        d = payload[3:6].reshape(3, -1).T
        excl = payload[6].reshape(-1).astype(jnp.int32)
        t, pid = closest_hit_bruteforce(
            o, d, pa, pb, pc, excl,
            t_min=cfg.t_min, t_max=cfg.t_max, eps=cfg.eps,
        )
        return t.reshape(t_tiles, r), pid.reshape(t_tiles, r)

    fn.supports_refine = True  # record the refine flag trace_tiled passes

    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)
    shade.render_tiled(
        arr2, fn, cfg, pos, at, W, H, ray_tile=256, block=(16, 16),
        interpret=True,
    )
    return calls


def pad_tiles(a, mult=32, fill=0.0):
    t = a.shape[-2] if a.ndim == 3 else a.shape[0]
    pad = (-t) % mult
    if not pad:
        return a
    widths = [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)]
    return np.pad(a, widths, constant_values=fill)


def count_entries(call, bmin, bmax, cfg):
    """Culled chunk-list entries for one recorded call, using the real
    cull code at the production granularity for that call."""
    payload = pad_tiles(call["payload"])
    valid = pad_tiles(call["valid"].astype(np.float32)) > 0
    o3 = jnp.asarray(payload[0:3])
    d3 = payload[3:6]
    inv3 = jnp.asarray(
        np.where(d3 != 0.0, 1.0 / np.where(d3 == 0.0, 1.0, d3), np.inf)
    )
    cap = call["cap"]
    cap = None if cap is None else jnp.asarray(pad_tiles(cap))
    kw = dict(t_min=cfg.t_min, t_max=cfg.t_max, t_cap=cap)
    if call["refine"]:
        mask = chunk_overlap_mask_perray_cm(
            o3, inv3, jnp.asarray(valid), bmin, bmax,
            tile_block=8, **kw,
        )
    else:
        mask = chunk_overlap_mask_cm(
            o3, inv3, jnp.asarray(valid), bmin, bmax, **kw
        )
    return int(np.asarray(mask).sum())


def leaf_tri_bounds(arrp):
    pa, pb, pc = (np.asarray(x)[1:] for x in (arrp.pa, arrp.pb, arrp.pc))
    tmin = np.minimum(np.minimum(pa, pb), pc)
    tmax = np.maximum(np.maximum(pa, pb), pc)
    return tmin, tmax


def bounds_of_groups(groups, tmin, tmax):
    bmin = np.stack([tmin[g].min(axis=0) for g in groups])
    bmax = np.stack([tmax[g].max(axis=0) for g in groups])
    return jnp.asarray(bmin), jnp.asarray(bmax)


def dp_partition(tmin, tmax, lam):
    """Optimal contiguous partition into runs of <= TC tris minimizing
    sum(chunk surface area) + lam * num_chunks.  O(P * TC)."""
    p = tmin.shape[0]
    best = np.full(p + 1, np.inf)
    cut = np.zeros(p + 1, dtype=np.int64)
    best[0] = 0.0
    for i in range(1, p + 1):
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for j in range(i - 1, max(i - TC, 0) - 1, -1):
            lo = np.minimum(lo, tmin[j])
            hi = np.maximum(hi, tmax[j])
            d = hi - lo
            sa = 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
            c = best[j] + sa + lam
            if c < best[i]:
                best[i] = c
                cut[i] = j
    groups = []
    i = p
    while i > 0:
        j = int(cut[i])
        groups.append(np.arange(j, i))
        i = j
    return groups[::-1]


def subtree_partition(scene, eps, target, indices):
    """Greedy subtree-aligned cuts: walk leaf order; close the open
    chunk whenever the next BVH subtree (largest node starting there)
    does not fit."""
    from rt_rs_tpu.bvh.builder import build_aabb_tree

    root = build_aabb_tree(scene, eps=eps, target_item_count=target)
    # Subtree spans over leaf order: collect (start, size) per node via
    # the same DFS that produced `indices`.
    spans = []

    def walk(node, start):
        size = 0
        if node.items.size and node.fst is None:
            size = node.items.size
        if node.fst is not None:
            size += walk(node.fst, start)
            size += walk(node.snd, start + size)
        spans.append((start, size))
        return size

    sys.setrecursionlimit(100000)
    total = walk(root, 0)
    assert total == len(indices)
    starts = {}
    for s, z in spans:  # largest node starting at s
        starts[s] = max(starts.get(s, 0), z)
    groups = []
    pos = 0
    p = len(indices)
    while pos < p:
        take = 0
        while take < TC and pos + take < p:
            nxt = starts.get(pos + take, 1)
            # descend until the subtree fits the remaining room
            while nxt > TC - take:
                nxt = max(1, nxt // 2) if nxt > 1 else 1
                # conservative: fall back to single tris near the edge
                if nxt <= 1:
                    nxt = 1
                    break
            take += nxt
        groups.append(np.arange(pos, pos + take))
        pos += take
    return groups


def eval_partition(name, groups, tmin, tmax, calls, cfg):
    bmin, bmax = bounds_of_groups(groups, tmin, tmax)
    per_call = [count_entries(c, bmin, bmax, cfg) for c in calls]
    fill = sum(len(g) for g in groups) / (TC * len(groups))
    print(
        f"{name:14s} nc={len(groups):4d} fill={fill:.2f} "
        f"entries={sum(per_call):7d}  per-call={per_call}",
        flush=True,
    )
    return sum(per_call)


def floor_entries(tmin, tmax, calls, cfg):
    """Clairvoyant floor: per-TRI slab passes packed TC/chunk per tile."""
    bmin, bmax = jnp.asarray(tmin), jnp.asarray(tmax)
    total = 0
    for call in calls:
        payload = pad_tiles(call["payload"])
        valid = pad_tiles(call["valid"].astype(np.float32)) > 0
        d3 = payload[3:6]
        inv3 = jnp.asarray(
            np.where(d3 != 0.0, 1.0 / np.where(d3 == 0.0, 1.0, d3), np.inf)
        )
        cap = call["cap"]
        cap = None if cap is None else jnp.asarray(pad_tiles(cap))
        mask = chunk_overlap_mask_perray_cm(
            jnp.asarray(payload[0:3]), inv3, jnp.asarray(valid),
            bmin, bmax, t_min=cfg.t_min, t_max=cfg.t_max, t_cap=cap,
            tile_block=8,
        )
        cnt = np.asarray(mask).sum(axis=1)  # tris passing, per tile
        total += int(np.ceil(cnt / TC).sum())
    print(f"floor (clairvoyant per-tile packing): {total}", flush=True)


def main():
    scene = Scene.load(SCENE)
    scene.camera = scene.camera.orbited(25.0)  # side-on (worst) view
    cfg = ComputeConfig()
    print(f"recording batches at {W}x{H} ...", flush=True)
    calls = record_batches(scene, cfg)
    print(
        f"{len(calls)} intersect calls; tiles/call = "
        f"{[c['payload'].shape[1] for c in calls]}, "
        f"refine = {[c['refine'] for c in calls]}",
        flush=True,
    )

    h = get_handler("pbvh", interpret=True)
    arrays = scene.pack()
    accel, arrp = h.build(scene, arrays)
    tmin, tmax = leaf_tri_bounds(arrp)
    p = tmin.shape[0]
    print(f"{p} tris", flush=True)

    cur = [np.arange(i, min(i + TC, p)) for i in range(0, p, TC)]
    base = eval_partition("cur64", cur, tmin, tmax, calls, cfg)
    for lam in (0.0, 0.5, 2.0):
        g = dp_partition(tmin, tmax, lam)
        eval_partition(f"dp64[{lam}]", g, tmin, tmax, calls, cfg)
    g = subtree_partition(scene, h.eps, h.target_item_count, np.arange(p))
    eval_partition("sub64", g, tmin, tmax, calls, cfg)
    floor_entries(tmin, tmax, calls, cfg)
    print(f"baseline cur64 entries: {base}")


if __name__ == "__main__":
    main()


def finer(scene_path=SCENE):
    """Entry counts for finer fixed-size chunkings of the SAME leaf
    order (cost model input for the tc re-sweep: time/entry ~ a + b*tc)."""
    scene = Scene.load(scene_path)
    scene.camera = scene.camera.orbited(25.0)
    cfg = ComputeConfig()
    calls = record_batches(scene, cfg)
    h = get_handler("pbvh", interpret=True)
    accel, arrp = h.build(scene, scene.pack())
    tmin, tmax = leaf_tri_bounds(arrp)
    p = tmin.shape[0]
    for tc in (64, 32, 16, 8):
        groups = [np.arange(i, min(i + tc, p)) for i in range(0, p, tc)]
        eval_partition(f"cur{tc}", groups, tmin, tmax, calls, cfg)
