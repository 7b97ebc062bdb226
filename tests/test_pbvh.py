"""Packet-BVH (Pallas kernel, interpret mode on CPU) equivalence tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops.pallas.packet_trace import (
    build_tri_chunks,
    chunk_overlap_mask,
)
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene


@pytest.fixture(scope="module")
def default_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "default.json"))


@pytest.fixture(scope="module")
def teatime_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "teatime.json"))


def _rand_rays(rng, n, scale=8.0):
    o = rng.normal(size=(n, 3), scale=scale).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _compare(scene, rays=256, seed=7):
    cfg = ComputeConfig()
    arrays = scene.pack()

    naive = get_handler("naive")
    _, na = naive.build(scene, arrays)
    naive_fn = naive.intersect_fn(None, na, cfg)

    h = get_handler("pbvh", interpret=True)
    accel, ha = h.build(scene, arrays)
    h_fn = h.intersect_fn(accel, ha, cfg)

    rng = np.random.default_rng(seed)
    o, d = _rand_rays(rng, rays)
    excl = jnp.zeros((rays,), dtype=jnp.int32)

    ones = jnp.ones((o.shape[0],), dtype=bool)
    t0, id0 = naive_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    t1, id1 = h_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5)
    assert ((np.asarray(id1) == 0) == (np.asarray(id0) == 0)).all()


def test_pbvh_matches_naive_default(default_scene):
    _compare(default_scene)


@pytest.mark.parametrize("cull_block", [1, 4, 32])
def test_pbvh_cull_block_granularities(default_scene, cull_block):
    """Culling granularity is a perf knob only — results are exact at
    every block size (1 = per-chunk, 32 = CHUNK_ALIGN)."""
    cfg = ComputeConfig()
    arrays = default_scene.pack()
    naive = get_handler("naive")
    _, na = naive.build(default_scene, arrays)
    naive_fn = naive.intersect_fn(None, na, cfg)

    h = get_handler("pbvh", interpret=True, cull_block=cull_block)
    accel, ha = h.build(default_scene, arrays)
    h_fn = h.intersect_fn(accel, ha, cfg)

    rng = np.random.default_rng(11)
    o, d = _rand_rays(rng, 256)
    excl = jnp.zeros((256,), dtype=jnp.int32)
    ones = jnp.ones((256,), dtype=bool)
    t0, id0 = naive_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    t1, id1 = h_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5)
    assert ((np.asarray(id1) == 0) == (np.asarray(id0) == 0)).all()


def test_pbvh_matches_naive_teatime(teatime_scene):
    _compare(teatime_scene, rays=128, seed=8)


def test_pbvh_render_matches_naive(default_scene):
    cfg = Config(resolution=Resolution.sized(48, 32))
    f_naive = np.asarray(
        Renderer(default_scene, config=cfg, handler="naive").render_frame()
    )
    f_p = np.asarray(
        Renderer(
            default_scene, config=cfg, handler="pbvh",
            handler_kwargs=dict(interpret=True),
        ).render_frame()
    )
    np.testing.assert_allclose(f_p, f_naive, atol=1e-5)


def test_chunk_bounds_cover(teatime_scene):
    """Every triangle's vertices lie inside its chunk AABB."""
    h = get_handler("pbvh", interpret=True)
    accel, arrays = h.build(teatime_scene, teatime_scene.pack())
    comp = np.asarray(accel.comp)  # [Nc, 8, 128]; components in lanes 0..8
    bmin = np.asarray(accel.bmin)
    bmax = np.asarray(accel.bmax)
    a = comp[:, :, 0:3]  # [Nc, 8, 3]
    b = a + comp[:, :, 3:6]
    c = a + comp[:, :, 6:9]
    # Skip padded (degenerate all-zero) triangles.
    real = np.abs(comp[:, :, 0:9]).sum(axis=2) > 0  # [Nc, 8]
    for corner in (a, b, c):
        for ch in range(accel.num_chunks):
            rows = real[ch]
            if not rows.any():
                continue
            lo = corner[ch][rows].min(axis=0)
            hi = corner[ch][rows].max(axis=0)
            assert (lo >= bmin[ch] - 1e-4).all()
            assert (hi <= bmax[ch] + 1e-4).all()


def test_overlap_mask_conservative(default_scene):
    """Culled (tile, chunk) pairs truly have no per-ray slab hits."""
    from rt_rs_tpu.ops.intersect import slab_test

    h = get_handler("pbvh", interpret=True)
    accel, arrays = h.build(default_scene, default_scene.pack())
    rng = np.random.default_rng(9)
    o, d = _rand_rays(rng, 128)
    o_t = jnp.asarray(o).reshape(1, 128, 3)
    inv = jnp.asarray(1.0 / d).reshape(1, 128, 3)
    valid = jnp.ones((1, 128), dtype=bool)
    mask = np.asarray(
        chunk_overlap_mask(
            o_t, inv, valid, accel.bmin, accel.bmax, t_min=0.01, t_max=1000.0
        )
    )[0]
    for c in range(accel.num_chunks):
        empty = bool((np.asarray(accel.bmin[c]) > np.asarray(accel.bmax[c])).any())
        if empty:
            # Padded chunks (inverted bounds) must always be culled;
            # the raw slab test passes them through (entry -inf/exit
            # +inf), which is exactly why chunk_overlap_mask rejects
            # min > max explicitly.
            assert not mask[c], f"empty pad chunk {c} not culled"
        elif not mask[c]:
            per_ray = np.asarray(
                slab_test(
                    jnp.asarray(o), jnp.asarray(1.0 / d),
                    accel.bmin[c], accel.bmax[c],
                )
            )
            assert not per_ray.any(), f"chunk {c} culled but has slab hits"
