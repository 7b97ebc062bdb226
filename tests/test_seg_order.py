"""Segment visit order (``seg_order``) — exactness and the auto mode.

The segmented (beyond-VMEM) intersect entry visits per-VMEM segments
in any static permutation; results must be BIT-identical for every
order because the merge is (t, pid)-lexicographic (equal-t keeps the
smallest global prim id — the naive loop's first-strictly-smaller
semantics; packet_closest_hit_segmented_tiled).  The order exists
purely to feed the cross-segment cap chain near hits first
(experiments/seg_order_ab.py: -22% list entries on the 50K canyon
side-on view, where build order happens to be exactly back-to-front).

``Renderer(seg_order="auto")`` picks camera-front-to-back per frame
with the camera direction snapped to 26 bins (bounded jit cache).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene


@pytest.fixture(scope="module")
def seg_setup(scenes_dir):
    from rt_rs_tpu.ops.pallas.packet_trace import (
        build_tri_chunks,
        split_chunks,
    )

    scene = Scene.load(str(scenes_dir / "teatime.json"))
    h = get_handler("pbvh")
    accel, arr2 = h.build(scene, scene.pack())
    chunks = build_tri_chunks(
        arr2.pa, arr2.pb, arr2.pc, tri_chunk=8,
        shade_rows=np.asarray(arr2.shade_table),
    )
    seg = split_chunks(chunks, max_seg_tris=2048)
    assert len(seg.segments) >= 3
    payload, valid, _ = shade.camera_ray_tiles(
        jnp.asarray(scene.camera.pos, jnp.float32),
        jnp.asarray(scene.camera.at, jnp.float32),
        64, 32, ray_tile=128, block=(8, 16),
    )
    return seg, payload, valid


def _orders(n):
    rot = tuple(range(1, n)) + (0,)
    return [tuple(reversed(range(n))), rot]


def test_closest_any_order_bit_exact(seg_setup):
    from rt_rs_tpu.ops.pallas.packet_trace import (
        packet_closest_hit_segmented_tiled,
    )

    seg, payload, valid = seg_setup
    kw = dict(t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True)
    t0, i0 = packet_closest_hit_segmented_tiled(seg, payload, valid, **kw)
    for order in _orders(len(seg.segments)):
        t1, i1 = packet_closest_hit_segmented_tiled(
            seg, payload, valid, seg_order=order, **kw
        )
        v = np.asarray(valid)
        np.testing.assert_array_equal(np.asarray(t1)[v], np.asarray(t0)[v])
        np.testing.assert_array_equal(np.asarray(i1)[v], np.asarray(i0)[v])


def test_rows_any_order_bit_exact(seg_setup):
    from rt_rs_tpu.ops.pallas.packet_trace import (
        packet_closest_hit_segmented_tiled,
    )

    seg, payload, valid = seg_setup
    kw = dict(
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
        emit_rows=True,
    )
    t0, i0, r0 = packet_closest_hit_segmented_tiled(
        seg, payload, valid, **kw
    )
    order = _orders(len(seg.segments))[0]
    t1, i1, r1 = packet_closest_hit_segmented_tiled(
        seg, payload, valid, seg_order=order, **kw
    )
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(i1)[v], np.asarray(i0)[v])
    vr = v[None].repeat(32, axis=0)
    np.testing.assert_array_equal(np.asarray(r1)[vr], np.asarray(r0)[vr])


def test_anyhit_any_order_exact(seg_setup):
    from rt_rs_tpu.ops.pallas.packet_trace import (
        packet_closest_hit_segmented_tiled,
    )

    seg, payload, valid = seg_setup
    payload = payload.at[7].set(5.0)  # occlusion cap row
    kw = dict(
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True, any_hit=True
    )
    b0 = packet_closest_hit_segmented_tiled(seg, payload, valid, **kw)
    for order in _orders(len(seg.segments)):
        b1 = packet_closest_hit_segmented_tiled(
            seg, payload, valid, seg_order=order, **kw
        )
        v = np.asarray(valid)
        np.testing.assert_array_equal(np.asarray(b1)[v], np.asarray(b0)[v])


def test_bad_order_rejected(seg_setup):
    from rt_rs_tpu.ops.pallas.packet_trace import (
        packet_closest_hit_segmented_tiled,
    )

    seg, payload, valid = seg_setup
    with pytest.raises(ValueError, match="permutation"):
        packet_closest_hit_segmented_tiled(
            seg, payload, valid, seg_order=(0, 0, 1),
            t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
        )


def _seg_renderer(scenes_dir, monkeypatch, **kw):
    """teatime forced segmented (4 x 2048-tri segments) through the
    full Renderer by shrinking the VMEM budget (the test_parallel.py
    recipe)."""
    from rt_rs_tpu.ops.pallas import packet_trace as pt

    monkeypatch.setattr(pt, "MAX_VMEM_CHUNKS", 16)
    scene = Scene.load(str(scenes_dir / "teatime.json"))
    r = Renderer(
        scene,
        config=Config(
            compute=ComputeConfig(bounces=2),
            resolution=Resolution.sized(32, 16),
        ),
        handler="pbvh",
        **kw,
    )
    assert _n_segments(r) >= 3
    return r


def _n_segments(r):
    from rt_rs_tpu.renderer import _segmented_parts

    parts = _segmented_parts(r.accel)
    return 0 if parts is None else len(parts)


def test_renderer_auto_order_bit_exact(scenes_dir, monkeypatch):
    base = _seg_renderer(scenes_dir, monkeypatch, seg_order="scene")
    auto = _seg_renderer(scenes_dir, monkeypatch)  # auto is the default
    f0 = np.asarray(base.render_frame(block=False))
    f1 = np.asarray(auto.render_frame(block=False))
    np.testing.assert_array_equal(f1, f0)
    # The auto handler really carries a non-default order for this
    # camera, and it is a valid permutation.
    h = auto._frame_handler()
    n = _n_segments(auto)
    assert h.seg_order is not None
    assert sorted(h.seg_order) == list(range(n))


def test_renderer_auto_order_tracks_camera(scenes_dir, monkeypatch):
    r = _seg_renderer(scenes_dir, monkeypatch)  # auto is the default
    o1 = r._frame_handler().seg_order
    # Jump the camera to the opposite side of the scene: front-to-back
    # must flip (teatime's segments span the scene along the leaf
    # order, so opposite views disagree on at least the first segment).
    pos = np.asarray(r.camera.pos, np.float64)
    mid = r._seg_centers.mean(0)
    r.camera = type(r.camera)(tuple(2 * mid - pos), tuple(r.camera.at))
    o2 = r._frame_handler().seg_order
    assert sorted(o2) == sorted(o1)
    assert o1 != o2
    # Cache: same camera -> same handler object (stable jit key).
    assert r._frame_handler() is r._frame_handler()


def test_renderer_fixed_tuple_order(scenes_dir, monkeypatch):
    base = _seg_renderer(scenes_dir, monkeypatch, seg_order="scene")
    n = _n_segments(base)
    rev = _seg_renderer(
        scenes_dir, monkeypatch, seg_order=tuple(reversed(range(n)))
    )
    f0 = np.asarray(base.render_frame(block=False))
    f1 = np.asarray(rev.render_frame(block=False))
    np.testing.assert_array_equal(f1, f0)


def test_renderer_auto_with_dual_tables(scenes_dir, monkeypatch):
    """Dual-granularity tables: the auto order is derived from the
    COARSE segments; the fine table (no attr slices -> larger
    segments, so generally a different count) keeps build order.
    Regression: round 5 originally applied the coarse permutation to
    both, crashing when the counts differed (tpu_check caught it on
    teapots3)."""
    base = _seg_renderer(scenes_dir, monkeypatch, seg_order="scene")
    dual = _seg_renderer(
        scenes_dir, monkeypatch,
        handler_kwargs={"tri_chunk_fine": 16},
    )
    from rt_rs_tpu.ops.pallas.packet_trace import DualTriChunks

    assert isinstance(dual.accel, DualTriChunks)
    f0 = np.asarray(base.render_frame(block=False))
    f1 = np.asarray(dual.render_frame(block=False))
    np.testing.assert_array_equal(f1, f0)


def test_resident_scene_ignores_auto(scenes_dir):
    # Resident tables have no segments: the "auto" default must be a
    # silent no-op.
    scene = Scene.load(str(scenes_dir / "default.json"))
    r = Renderer(
        scene,
        config=Config(resolution=Resolution.sized(32, 16)),
        handler="pbvh",
    )
    assert r.seg_order == "scene"
    assert r._frame_handler() is r.handler
