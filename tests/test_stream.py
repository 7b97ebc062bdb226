"""Streaming (HBM-resident) packet kernel: exactness beyond the VMEM cap."""

import numpy as np
import pytest

import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops.pallas.packet_trace import build_tri_chunks
from rt_rs_tpu.ops.pallas.packet_stream import stream_closest_hit
from rt_rs_tpu.scene import Scene  # noqa: E501


def _soup(rng, n_tris, scale=5.0):
    scene = Scene.empty()
    scene.vert_pos = rng.normal(size=(n_tris * 3, 3), scale=scale).astype(
        np.float32
    )
    scene.vert_norm = np.tile(
        np.array([[0, 1, 0]], np.float32), (n_tris * 3, 1)
    )
    scene.prim_indices = np.arange(n_tris * 3, dtype=np.uint32).reshape(-1, 3)
    scene.prim_material = np.zeros(n_tris, dtype=np.int32)
    scene.mat_color = np.array([[1.0, 1.0, 1.0]], np.float32)
    scene.mat_albedo = np.array([[1.0, 0.0, 0.0]], np.float32)
    scene.mat_spec = np.array([1.0], np.float32)
    return scene


def _rays(rng, n):
    o = rng.normal(size=(n, 3), scale=8.0).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_stream_matches_resident_small():
    """Same chunks, both kernels -> identical hits."""
    rng = np.random.default_rng(50)
    scene = _soup(rng, 300)
    arrays = scene.pack()
    chunks = build_tri_chunks(arrays.pa, arrays.pb, arrays.pc, max_chunks=None)
    o, d = _rays(rng, 96)
    excl = jnp.zeros((96,), jnp.int32)
    ones = jnp.ones((96,), bool)
    from rt_rs_tpu.ops.pallas.packet_trace import packet_closest_hit

    t0, i0 = packet_closest_hit(
        chunks, o, d, excl, ones,
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
    )
    t1, i1 = stream_closest_hit(
        chunks, o, d, excl, ones,
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
    )
    # rtol 1e-5: the two kernels lower/fuse differently, so t values
    # can differ in the last few ulps; ids may then flip on near-ties.
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5)
    same_id = np.asarray(i1) == np.asarray(i0)
    assert same_id.mean() > 0.95


def test_stream_matches_naive_beyond_vmem_cap():
    """A 16K-triangle soup (over the resident cap) routes to streaming
    via the pbvh handler and matches naive brute force."""
    rng = np.random.default_rng(51)
    scene = _soup(rng, 16000, scale=20.0)
    cfg = ComputeConfig()
    arrays = scene.pack()

    naive = get_handler("naive")
    _, na = naive.build(scene, arrays)
    nf = naive.intersect_fn(None, na, cfg)

    from rt_rs_tpu.ops.pallas.packet_trace import SegmentedTriChunks

    h = get_handler("pbvh", interpret=True)
    accel, ha = h.build(scene, arrays)
    # Beyond the VMEM cap the handler pre-slices into segments.
    assert isinstance(accel, SegmentedTriChunks)
    assert len(accel.segments) > 1
    hf = h.intersect_fn(accel, ha, cfg)

    o, d = _rays(rng, 64)
    excl = jnp.zeros((64,), jnp.int32)
    ones = jnp.ones((64,), bool)
    t0, i0 = nf(o, d, excl, ones)
    t1, i1 = hf(o, d, excl, ones)
    # atol 5e-6: the random soup contains near-coincident triangles
    # whose per-triangle t differs between naive's and the kernel's
    # (algebraically identical) MT formulations by a few ulps, which
    # can flip which of two ~equal hits wins.
    np.testing.assert_allclose(
        np.asarray(t1), np.asarray(t0), rtol=1e-4, atol=5e-6
    )
    assert ((np.asarray(i1) == 0) == (np.asarray(i0) == 0)).all()


def test_stream_small_chunks_shrink_blocks():
    """tri_chunk < 16 would give > 32 chunks per 512-tri DMA block,
    overflowing the int32 overlap word (bits 32+ silently dropped, so
    those chunks were never tested).  Blocks must shrink to keep chunks
    per block <= 32; equality vs the resident kernel over > 32 chunks
    pins the fix."""
    rng = np.random.default_rng(51)
    scene = _soup(rng, 400)  # 50+ chunks at tri_chunk=8
    arrays = scene.pack()
    chunks = build_tri_chunks(
        arrays.pa, arrays.pb, arrays.pc, max_chunks=None, tri_chunk=8
    )
    o, d = _rays(rng, 96)
    excl = jnp.zeros((96,), jnp.int32)
    ones = jnp.ones((96,), bool)
    from rt_rs_tpu.ops.pallas.packet_trace import packet_closest_hit

    t0, i0 = packet_closest_hit(
        chunks, o, d, excl, ones,
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
    )
    t1, i1 = stream_closest_hit(
        chunks, o, d, excl, ones,
        t_min=0.01, t_max=1000.0, eps=1e-7, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5)


def test_split_chunks_attr_segments_fit_budget(scenes_dir):
    """Segment sizing is byte-accurate at any chunk height: attr_t is
    a fixed 16 KB/chunk, so tc=16 tables cost 1536 B/tri and a
    tri-count cap calibrated for tc=64 would cut segments ~2x too big
    for the emit-rows VMEM budget (round-3 package review finding)."""
    import numpy as np

    from rt_rs_tpu.ops.pallas.packet_trace import (
        build_tri_chunks,
        resident_fits,
        split_chunks,
    )
    from rt_rs_tpu.scene import Scene

    scene = Scene.load(str(scenes_dir / "teatime.json"))
    arrays = scene.pack()
    chunks = build_tri_chunks(
        arrays.pa, arrays.pb, arrays.pc, max_chunks=None, tri_chunk=16,
        shade_rows=np.asarray(arrays.shade_table),
    )
    seg = split_chunks(chunks)
    assert len(seg.segments) >= 2  # 9.7 MB of table split the budget
    for s in seg.segments:
        assert s.attr_t is not None
        assert resident_fits(s, with_attrs=True)
