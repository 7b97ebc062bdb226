"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.parallel import (
    hybrid_mesh,
    image_mesh,
    make_sharded_render,
)
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

import jax.numpy as jnp


@pytest.fixture(scope="module")
def default_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "default.json"))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(default_scene):
    w, h = 32, 24  # h divides 8
    cfg = ComputeConfig()
    handler = get_handler("naive")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = image_mesh(8)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, lum = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    frame = np.asarray(frame)
    assert frame.shape == (h, w, 3)

    single = np.asarray(
        Renderer(
            default_scene,
            config=Config(resolution=Resolution.sized(w, h)),
            handler="naive",
        ).render_frame()
    )
    np.testing.assert_allclose(frame, single, atol=1e-5)
    # Metering psum agrees with the host-side mean luminance.
    expect = float(
        (single @ np.array([0.2126, 0.7152, 0.0722], np.float32)).mean()
    )
    assert float(lum) == pytest.approx(expect, rel=1e-4)


def test_sharded_packet_kernel_matches_single(default_scene):
    """The exact configuration the driver's multichip dryrun gates on:
    the Pallas packet kernel (pbvh, interpret on CPU) under shard_map
    over the full 8-device mesh."""
    w, h = 64, 64  # h divides 8
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = image_mesh(8)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    frame = np.asarray(frame)
    assert frame.shape == (h, w, 3)

    single = np.asarray(
        Renderer(
            default_scene,
            config=Config(
                compute=cfg, resolution=Resolution.sized(w, h)
            ),
            handler="pbvh",
        ).render_frame()
    )
    np.testing.assert_allclose(frame, single, atol=1e-5)


def test_sharded_render_two_devices(default_scene):
    w, h = 16, 8
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("naive")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)
    mesh = image_mesh(2)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    assert np.asarray(frame).shape == (h, w, 3)


def test_height_must_divide(default_scene):
    cfg = ComputeConfig()
    handler = get_handler("naive")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)
    with pytest.raises(ValueError):
        make_sharded_render(handler, accel, arrays, cfg, 16, 9, image_mesh(8))


def test_sharded_rows_anyhit_path_matches_single(default_scene):
    """Round-3 fast-path parity (VERDICT item 4): the kernel-emitted
    rows + any-hit shadow branch under shard_map equals the single-chip
    render; wg-hint block tuning is honored via `resolution`."""
    w, h = 64, 64
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = image_mesh(8)
    fn = make_sharded_render(
        handler, accel, arrays, cfg, w, h, mesh,
        resolution=Resolution.fixed(w, h, 16),
        force_rows=True,
    )
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    frame = np.asarray(frame)

    single = np.asarray(
        Renderer(
            default_scene,
            config=Config(compute=cfg, resolution=Resolution.sized(w, h)),
            handler="pbvh",
        ).render_frame()
    )
    np.testing.assert_allclose(frame, single, atol=1e-5)


def _single_frame(scene, cfg, w, h, **hkw):
    return np.asarray(
        Renderer(
            scene,
            config=Config(compute=cfg, resolution=Resolution.sized(w, h)),
            handler="pbvh",
            handler_kwargs=hkw,
        ).render_frame()
    )


def test_scene_parallel_rows_matches_single(default_scene):
    """2-D mesh (2 bands x 4 scene shards): the chunk table splits
    across the scene axis (tri_chunk=8 -> 32 chunks -> 8 real chunks
    per shard) and per-call pmin/pmax merges reproduce the sequential
    semantics.  Default path = kernel-emitted rows + any-hit (attrs
    present), full fidelity with bounces so exclusion ids cross the
    shard shift."""
    w, h = 64, 32
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh", tri_chunk=8)
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = hybrid_mesh(2, 4)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    single = _single_frame(default_scene, cfg, w, h, tri_chunk=8)
    np.testing.assert_allclose(np.asarray(frame), single, atol=1e-5)


def test_scene_parallel_gather_path_matches_single(default_scene):
    """Scene-parallel closest-hit merge on the gather path (rows
    forced off -> fused shadow+bounce batches through the plain
    min-t + pid tie-break merge), 4 bands x 2 shards."""
    w, h = 64, 32
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh", tri_chunk=8)
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = hybrid_mesh(4, 2)
    fn = make_sharded_render(
        handler, accel, arrays, cfg, w, h, mesh, force_rows=False
    )
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    single = _single_frame(default_scene, cfg, w, h, tri_chunk=8)
    np.testing.assert_allclose(np.asarray(frame), single, atol=1e-5)


def test_scene_parallel_requires_packet_table(default_scene):
    """Backends without a flat chunk table can't shard the scene axis."""
    cfg = ComputeConfig()
    handler = get_handler("naive")
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)
    with pytest.raises(TypeError):
        make_sharded_render(
            handler, accel, arrays, cfg, 16, 8, hybrid_mesh(2, 4)
        )


def test_scene_parallel_nondividing_shards(default_scene):
    """3 shards over a 32-chunk table forces tail padding (pad to 33,
    11 chunks/shard) — pad chunks must never hit or shift ids."""
    w, h = 32, 16
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh", tri_chunk=8)
    arrays = default_scene.pack()
    accel, arrays = handler.build(default_scene, arrays)

    mesh = hybrid_mesh(1, 3)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, _ = fn(
        jnp.asarray(default_scene.camera.pos, jnp.float32),
        jnp.asarray(default_scene.camera.at, jnp.float32),
    )
    single = _single_frame(default_scene, cfg, w, h, tri_chunk=8)
    np.testing.assert_allclose(np.asarray(frame), single, atol=1e-5)


def test_scene_parallel_local_segmented(scenes_dir, monkeypatch):
    """A shard whose slice exceeds the VMEM cap runs the segmented
    kernel via split_chunks_traced inside shard_map (static local
    segment bases composing with the traced shard base).  Forced by
    shrinking the VMEM budget: teatime at tri_chunk=8 -> 800 chunks ->
    400/shard -> 13 local segments under MAX_VMEM_CHUNKS=16."""
    from rt_rs_tpu.ops.pallas import packet_trace as pt

    scene = Scene.load(str(scenes_dir / "teatime.json"))
    w, h = 32, 16
    cfg = ComputeConfig(bounces=2)
    handler = get_handler("pbvh", tri_chunk=8)
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)

    single = _single_frame(scene, cfg, w, h, tri_chunk=8)

    monkeypatch.setattr(pt, "MAX_VMEM_CHUNKS", 16)
    mesh = hybrid_mesh(1, 2)
    fn = make_sharded_render(handler, accel, arrays, cfg, w, h, mesh)
    frame, _ = fn(
        jnp.asarray(scene.camera.pos, jnp.float32),
        jnp.asarray(scene.camera.at, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(frame), single, atol=1e-5)
