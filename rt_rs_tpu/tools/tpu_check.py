"""Compiled-kernel verification on the current backend (run on TPU).

The CPU test suite exercises Pallas only in interpret mode; this tool
re-renders the golden scenes with every accelerated handler through the
real Mosaic-compiled kernels and diffs against ``tests/goldens`` (the
verify-skill recipe, scripted), then cross-checks:

* the rows/any-hit path (the resident-table default at every size)
  against the gather path at 1024x512;
* the fused bounce kernel against the two-kernel path;
* a beyond-VMEM (segmented) scene: gather vs rows/any-hit vs the DMA
  streaming kernel;
* DynamicRenderer (on-device rebuild + refit) against the static
  packet render of the same geometry.

Usage:  python -m rt_rs_tpu.tools.tpu_check
Exit code 0 = all checks passed.
"""

from __future__ import annotations

import sys

import numpy as np

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene, presets
from rt_rs_tpu.utils.image import golden_diff_ok, read_png

SCENES = "/root/reference/scenes"
GOLDENS = "tests/goldens"
HANDLERS = ("naive", "bvh", "rf_bvh", "pbvh", "lbvh")


def main() -> int:
    ok = True
    jobs = {
        name: (Scene.load(f"{SCENES}/{name}.json"), 4)
        for name in ("default", "teatime")
    }
    # The special-branch goldens (rt_rs_tpu/scene/presets.py): cessna
    # (NaN normals -> rows fallback), shuttle (multi-light), ghost
    # (material=-1 -> XLA shade.render fallback), teapots3
    # (beyond-VMEM -> segmented kernel).
    jobs.update(presets.golden_set())
    for name, (scene, bounces) in jobs.items():
        golden = read_png(f"{GOLDENS}/{name}_64x48.png")
        # Negative-material scenes route through the per-backend XLA
        # fallback (renderer.py:107); knife-edge pixels may flip vs the
        # CPU golden (bounded to golden contrast edges by
        # golden_diff_ok).  Kernel-path scenes must stay strict.
        edge_ok = not scene.pack().no_negative_materials
        cross = {}
        for handler in HANDLERS:
            if name == "cessna" and handler == "rf_bvh":
                # cessna has a >8-prim unsplittable cluster the RF
                # format cannot represent (RfFormatError; same skip as
                # tests/test_scenes_matrix.py).
                continue
            if name == "teapots3" and handler == "lbvh":
                # lbvh rejects beyond-VMEM scenes by contract (the
                # segmented path belongs to bvh/pbvh; handlers/lbvh.py).
                continue
            r = Renderer(
                scene,
                config=Config(
                    compute=ComputeConfig(bounces=bounces),
                    resolution=Resolution.sized(64, 48),
                ),
                handler=handler,
            )
            img = r.render_image()
            cross[handler] = img
            good, detail = golden_diff_ok(
                img, golden, allow_edge_flips=edge_ok
            )
            ok &= good
            print(
                f"{name:>8} {handler:>7}: {detail}  "
                f"{'PASS' if good else 'FAIL'}",
                flush=True,
            )
        if edge_ok and len(cross) > 1:
            # Edge flips are only acceptable when every handler agrees
            # on THIS backend — the flip must be a backend property of
            # the shared fallback shading, not a handler divergence.
            base_h, base_img = next(iter(cross.items()))
            for handler, img in cross.items():
                d = int(np.abs(img.astype(int) - base_img.astype(int)).max())
                good = d == 0
                ok &= good
                print(
                    f"{name:>8} {handler:>7} vs {base_h} on-backend: "
                    f"max {d}  {'PASS' if good else 'FAIL'}",
                    flush=True,
                )

    # Rows/any-hit path vs the gather path: render one size both ways
    # (force_rows pins each branch regardless of defaults).
    # NOTE: do NOT re-import ComputeConfig here — a function-level
    # import makes the name local for the WHOLE function, so the
    # handler sweep above would raise UnboundLocalError (this exact
    # bug silently broke tpu_check for all of round 4).
    import jax.numpy as jnp

    from rt_rs_tpu.handlers import get_handler
    from rt_rs_tpu.ops import shade

    scene = Scene.load(f"{SCENES}/teatime.json")
    cfg = ComputeConfig()
    h = get_handler("pbvh")
    accel, arr2 = h.build(scene, scene.pack())
    pos = jnp.asarray(scene.camera.pos, jnp.float32)
    at = jnp.asarray(scene.camera.at, jnp.float32)
    kw = dict(ray_tile=256, block=(16, 16))
    gather = np.asarray(
        shade.render_tiled(
            arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg,
            pos, at, 1024, 512, **kw,
        )
    )
    rows = np.asarray(
        shade.render_tiled(
            arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg,
            pos, at, 1024, 512, **kw,
            intersect_rows_fn=h.intersect_tiled_rows_fn(accel, arr2, cfg),
            intersect_anyhit_fn=h.intersect_tiled_anyhit_fn(
                accel, arr2, cfg
            ),
        )
    )
    d = np.abs(rows - gather).max()
    good = d <= 1e-5
    ok &= good
    print(
        f"rows+anyhit vs gather @1024x512: max diff {d:.2e}  "
        f"{'PASS' if good else 'FAIL'}",
        flush=True,
    )

    def check(label, a, b, tol=1e-5):
        nonlocal ok
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        good = d <= tol
        ok &= good
        print(f"{label}: max diff {d:.2e}  {'PASS' if good else 'FAIL'}",
              flush=True)

    # Fused bounce kernel (round-3 default) vs the two-kernel path.
    cfg_small = Config(resolution=Resolution.sized(160, 120))
    fused = Renderer(
        scene, config=cfg_small, handler="pbvh", fuse_bounce=True
    ).render_frame()
    unfused = Renderer(
        scene, config=cfg_small, handler="pbvh", fuse_bounce=False
    ).render_frame()
    check("fused vs unfused bounce @160x120", fused, unfused)

    # Segmented (beyond-VMEM) scene: 3 teapots = 18,960 tris (the
    # teapots3 golden scene).
    big = presets.tiled_teapots(3)
    from rt_rs_tpu.ops.pallas.packet_trace import SegmentedTriChunks

    seg_r = Renderer(big, config=cfg_small, handler="pbvh")
    assert isinstance(seg_r.accel, SegmentedTriChunks), "scene not segmented"
    seg_gather = seg_r.render_frame()
    seg_rows = Renderer(
        big, config=cfg_small, handler="pbvh", force_rows=True
    ).render_frame()
    check("segmented rows+anyhit vs gather @160x120", seg_rows, seg_gather)
    dma = Renderer(
        big, config=cfg_small, handler="pbvh",
        handler_kwargs={"streaming_mode": "dma"},
    ).render_frame()
    check("DMA streaming vs segmented @160x120", dma, seg_gather)

    # Dual-granularity tables (coarse for primaries, fine for refine
    # batches) must be unobservable in outputs — resident AND
    # segmented (DualTriChunks bit-consistency, compiled kernels).
    dual = Renderer(
        scene, config=cfg_small, handler="pbvh",
        handler_kwargs={"tri_chunk_fine": 16},
    ).render_frame()
    check("dual tables vs single @160x120", dual, unfused)
    seg_dual = Renderer(
        big, config=cfg_small, handler="pbvh",
        handler_kwargs={"tri_chunk_fine": 16},
    ).render_frame()
    check("segmented dual vs single @160x120", seg_dual, seg_gather)

    # The collapse default (dead-group block-copy elision via repeated
    # prefetched block indices — packet_closest_hit_tiled collapse=) is
    # force-disabled in interpret mode, so the CPU suite never executes
    # it; this is its explicit correctness gate (VERDICT round-4
    # weakness 1): full-render equality collapse=True (default) vs
    # False through every call kind — resident rows+any-hit+closest,
    # resident gather closest, and both segmented paths.  The claim is
    # exact-by-contract (dead groups' outputs are unspecified either
    # way and masked downstream), so the tolerance is ZERO.
    def no_collapse(scene_, **kw):
        return Renderer(
            scene_, config=cfg_small, handler="pbvh",
            handler_kwargs={"collapse": False}, **kw,
        ).render_frame()

    check("collapse off vs on, resident rows @160x120",
          no_collapse(scene), unfused, tol=0.0)
    res_gather = Renderer(
        scene, config=cfg_small, handler="pbvh", force_rows=False
    ).render_frame()
    check("collapse off vs on, resident gather @160x120",
          no_collapse(scene, force_rows=False), res_gather, tol=0.0)
    check("collapse off vs on, segmented gather @160x120",
          no_collapse(big), seg_gather, tol=0.0)
    check("collapse off vs on, segmented rows @160x120",
          no_collapse(big, force_rows=True), seg_rows, tol=0.0)

    # Segment visit order must be output-invisible through the
    # compiled kernels (the (t, pid)-lexicographic merge claim —
    # packet_closest_hit_segmented_tiled; seg_order="auto" is the
    # Renderer default for segmented scenes, round 5).  seg_gather
    # above rendered with the auto order; compare the exact reverse.
    n_seg = len(seg_r.accel.segments)
    rev = Renderer(
        big, config=cfg_small, handler="pbvh",
        seg_order=tuple(reversed(range(n_seg))),
    ).render_frame()
    check("segment order reversed vs auto @160x120", rev, seg_gather,
          tol=0.0)

    # DynamicRenderer (on-device LBVH rebuild + refit) at the rest pose
    # must match the static packet render of the same scene.
    from rt_rs_tpu.renderer import DynamicRenderer

    static = Renderer(scene, config=cfg_small, handler="lbvh").render_frame()
    for refit in (False, True):
        # force_rows=False pins the gather branch (rows is the dynamic
        # default at every size since the late-round-3 re-sweep).
        dyn = DynamicRenderer(
            scene, config=cfg_small, refit=refit, force_rows=False
        )
        frame = dyn.render_frame(scene.vert_pos)
        check(f"dynamic refit={refit} vs static lbvh @160x120", frame, static)
    # The dynamic rows default (per-frame attr build + emit-rows kernel
    # on a device-built table).
    dyn_rows = DynamicRenderer(scene, config=cfg_small, refit=True)
    check(
        "dynamic rows vs static lbvh @160x120",
        dyn_rows.render_frame(scene.vert_pos),
        static,
    )

    print("ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
