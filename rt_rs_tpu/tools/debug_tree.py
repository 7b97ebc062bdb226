"""``debug_tree`` — recursive BVH / RF-BVH tree dumps.

The analogue of the reference's manual-inspection printers
``debug_aabb`` / ``debug_rf_aabb`` (``src/lib/handlers/rf.rs:246-344``):
an indented preorder walk printing ``Node [min] [max]`` for interior
nodes and ``Leaf [min] [max]: [items]`` for leaves, in the same
``{:.3}`` float format.  The RF dump decodes the packed 16-byte records
(f16 bounds, tagged children, 8-slot leaf payloads) so the packed tree
can be eyeballed against the plain one — the reference's RF-vs-plain
validation workflow.

Usage::

    python -m rt_rs_tpu.tools.debug_tree --scene scenes/teatime.json
    python -m rt_rs_tpu.tools.debug_tree --bvh scenes/teatime.bvh.json
    python -m rt_rs_tpu.tools.debug_tree --scene ... --rf   # packed form
"""

from __future__ import annotations

import argparse
import sys
from typing import TextIO


def _fmt(vals) -> str:
    return "[{:.3f}, {:.3f}, {:.3f}]".format(*(float(v) for v in vals))


def _walk_preorder(emit, fst, snd, out: TextIO) -> None:
    """Explicit-stack preorder walk (same visit order as the
    reference's recursion, rf.rs:247-290) — path-shaped device-built
    trees can run hundreds of thousands of frames deep, past what
    CPython's C stack survives even with a raised recursion limit."""
    stack = [(0, 0)]
    while stack:
        curr, indent = stack.pop()
        children = emit(curr, indent)
        if children is not None:
            # Push snd first so fst prints first (preorder).
            stack.append((int(snd[curr]), indent + 1))
            stack.append((int(fst[curr]), indent + 1))


def debug_aabb(data, out: TextIO = sys.stdout) -> None:
    """Print a flattened plain BVH (``debug_aabb``, rf.rs:247-290)."""

    def emit(curr: int, indent: int):
        lo = _fmt(data.bounds_min[curr])
        hi = _fmt(data.bounds_max[curr])
        count = int(data.item_count[curr])
        if count > 0:
            i0 = int(data.item_idx[curr])
            items = [int(x) for x in data.indices[i0 : i0 + count]]
            out.write(f"{' ' * indent} Leaf {lo} {hi}: {items}\n")
            return None
        out.write(f"{' ' * indent} Node {lo} {hi}\n")
        return True

    _walk_preorder(emit, data.fst, data.snd, out)


def debug_rf_aabb(rf, out: TextIO = sys.stdout) -> None:
    """Print a packed RF-BVH (``debug_rf_aabb``, rf.rs:292-344)."""
    from rt_rs_tpu.bvh.rf import unpack_rf

    d = unpack_rf(rf)

    def emit(curr: int, indent: int):
        lo = _fmt(d["bmin"][curr])
        hi = _fmt(d["bmax"][curr])
        if d["is_leaf"][curr]:
            items = [int(x) for x in d["leaf_prims"][curr] if x != 0]
            out.write(f"{' ' * indent} Leaf {lo} {hi}: {items}\n")
            return None
        out.write(f"{' ' * indent} Node {lo} {hi}\n")
        return True

    _walk_preorder(emit, d["fst"], d["snd"], out)


def check_tree(data, scene=None, out: TextIO = sys.stdout) -> int:
    """Structural invariant checks over a flattened BVH -> violation
    count (0 = healthy).  The machine-checkable form of the manual
    eyeballing the reference's debug printers support:

    * every primitive appears in exactly one leaf;
    * (with ``scene``) every child's COVERING bounds lie inside its
      parent's — the stored bounds deliberately don't satisfy this
      (the reference's in-place shrink never refits after shrinking;
      PARITY.md / :meth:`BvhData.cover_bounds`) — plus geometry
      quality stats via the ``V3Ops`` helpers
      (:mod:`rt_rs_tpu.geom.v3`): zero-area (degenerate) faces — the
      ones whose NaN smooth normals force the rows-fallback path —
      and sliver triangles (min interior ``v3.angle``).
    """
    import numpy as np

    from rt_rs_tpu.geom import v3

    bad = 0
    n = data.bounds_min.shape[0]
    if scene is not None:
        cover_min, cover_max = data.cover_bounds(scene)
        for curr in range(n):
            if int(data.item_count[curr]) > 0:
                continue
            for child in (int(data.fst[curr]), int(data.snd[curr])):
                if not (
                    (cover_min[curr] <= cover_min[child]).all()
                    and (cover_max[child] <= cover_max[curr]).all()
                ):
                    out.write(
                        f"VIOLATION: child {child} cover bounds exceed "
                        f"parent {curr}\n"
                    )
                    bad += 1
    # Leaf coverage: the indices array is one permutation of the prim
    # ids, and the leaves' [item_idx, item_idx+count) ranges tile it.
    spans = []
    for curr in range(n):
        count = int(data.item_count[curr])
        if count > 0:
            spans.append((int(data.item_idx[curr]), count))
    spans.sort()
    pos = 0
    for i0, count in spans:
        if i0 != pos:
            out.write(f"VIOLATION: leaf range gap/overlap at {i0}\n")
            bad += 1
        pos = i0 + count
    total = len(data.indices)
    if pos != total:
        out.write(f"VIOLATION: leaves cover {pos} of {total} slots\n")
        bad += 1
    ids = np.sort(np.asarray(data.indices))
    if not np.array_equal(ids, np.arange(total, dtype=ids.dtype)):
        out.write("VIOLATION: indices are not a permutation of prims\n")
        bad += 1

    if scene is not None:
        degenerate = 0
        min_angle = float("inf")
        for a, b, c in scene.prim_indices:
            pa = scene.vert_pos[int(a)].astype(float)
            pb = scene.vert_pos[int(b)].astype(float)
            pc = scene.vert_pos[int(c)].astype(float)
            if v3.mag(v3.cross(pb - pa, pc - pa)) == 0.0:
                degenerate += 1
                continue
            min_angle = min(
                min_angle,
                v3.angle(pa, pb, pc),
                v3.angle(pb, pc, pa),
                v3.angle(pc, pa, pb),
            )
        out.write(
            f"geometry: {degenerate} degenerate (zero-area) faces; "
            f"min interior angle "
            f"{min_angle if min_angle != float('inf') else 0.0:.4f} rad\n"
        )
    out.write(f"check: {bad} violations\n")
    return bad


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rt_rs_tpu.tools.debug_tree")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON: build the BVH, then dump")
    src.add_argument("--bvh", help="precomputed *.bvh.json checkpoint")
    p.add_argument(
        "--rf", action="store_true",
        help="dump the packed RF record tree instead of the plain one",
    )
    p.add_argument(
        "--check", action="store_true",
        help="validate tree invariants instead of dumping; exit code = "
        "number of violations",
    )
    p.add_argument("--eps", type=float, default=0.02)
    p.add_argument(
        "--item-count", type=int, default=None,
        help="builder leaf target (default: 2 plain / 4 RF, like the "
        "reference handlers)",
    )
    args = p.parse_args(argv)

    from rt_rs_tpu.bvh import BvhData

    scene = None
    if args.bvh:
        data = BvhData.load(args.bvh)
    else:
        from rt_rs_tpu.bvh import build_bvh
        from rt_rs_tpu.scene import Scene

        scene = Scene.load(args.scene)
        target = args.item_count or (4 if args.rf else 2)
        data = build_bvh(scene, eps=args.eps, target_item_count=target)

    if args.check:
        return check_tree(data, scene)

    if args.rf:
        from rt_rs_tpu.bvh.rf import pack_rf

        if scene is not None:
            # Truly covering bounds, like the rf handler packs
            # (PARITY.md: the stored shrunk bounds are a reference
            # defect a culling tracer must not inherit).
            cover_min, cover_max = data.cover_bounds(scene)
            debug_rf_aabb(pack_rf(data, cover_min, cover_max))
        else:
            debug_rf_aabb(pack_rf(data))
    else:
        debug_aabb(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
