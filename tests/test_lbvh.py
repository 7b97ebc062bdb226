"""On-device LBVH: Morton codes, Karras hierarchy, handler, dynamics."""

import numpy as np
import pytest

import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.handlers import get_handler
from rt_rs_tpu.ops.lbvh import (
    karras_hierarchy,
    morton_codes,
    morton_order,
    refit_bounds,
)
from rt_rs_tpu.renderer import DynamicRenderer, Renderer
from rt_rs_tpu.scene import Scene


@pytest.fixture(scope="module")
def default_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "default.json"))


@pytest.fixture(scope="module")
def teatime_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "teatime.json"))


def test_morton_codes_basic():
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    pts = jnp.asarray(
        np.array(
            [[0, 0, 0], [1, 1, 1], [0.999, 0, 0], [0, 0.999, 0], [0, 0, 0.999]],
            dtype=np.float32,
        )
    )
    codes = np.asarray(morton_codes(pts, lo, hi))
    assert codes[0] == 0
    assert codes[1] == 0x3FFFFFFF  # all 30 bits set
    # x contributes the highest interleaved bit.
    assert codes[2] > codes[3] > codes[4]


def test_morton_order_is_permutation(teatime_scene):
    arrays = teatime_scene.pack()
    pa, pb, pc = arrays.pa[1:], arrays.pb[1:], arrays.pc[1:]
    cent = np.asarray((pa + pb + pc) / 3.0)
    codes = morton_codes(
        jnp.asarray(cent),
        jnp.asarray(cent.min(0)),
        jnp.asarray(cent.max(0)),
    )
    order = np.asarray(morton_order(codes))
    assert sorted(order.tolist()) == list(range(cent.shape[0]))
    assert np.all(np.diff(np.asarray(codes)[order].astype(np.int64)) >= 0)


def test_karras_hierarchy_structure(teatime_scene):
    """Radix-tree invariants: walking from the root reaches every leaf
    exactly once; refit bounds cover leaf bounds."""
    arrays = teatime_scene.pack()
    pa, pb, pc = arrays.pa[1:], arrays.pb[1:], arrays.pc[1:]
    cent = (pa + pb + pc) / 3.0
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    codes = morton_codes(cent, lo, hi)
    order = morton_order(codes)
    codes_sorted = codes[order]

    left, right, left_leaf, right_leaf, _, _ = karras_hierarchy(codes_sorted)
    n = codes_sorted.shape[0]
    left, right = np.asarray(left), np.asarray(right)
    l_leaf, r_leaf = np.asarray(left_leaf), np.asarray(right_leaf)

    seen_leaves = np.zeros(n, dtype=int)
    seen_internal = np.zeros(n - 1, dtype=int)
    stack = [0]
    while stack:
        node = stack.pop()
        seen_internal[node] += 1
        for child, is_leaf in ((left[node], l_leaf[node]),
                               (right[node], r_leaf[node])):
            if is_leaf:
                seen_leaves[child] += 1
            else:
                stack.append(child)
    assert (seen_leaves == 1).all()
    assert (seen_internal == 1).all()

    # Bounds refit covers every leaf under every ancestor.
    tri_min = np.minimum(np.minimum(np.asarray(pa), np.asarray(pb)), np.asarray(pc))
    tri_max = np.maximum(np.maximum(np.asarray(pa), np.asarray(pb)), np.asarray(pc))
    o = np.asarray(order)
    nmin, nmax = refit_bounds(
        jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(l_leaf), jnp.asarray(r_leaf),
        jnp.asarray(tri_min[o]), jnp.asarray(tri_max[o]),
    )
    nmin, nmax = np.asarray(nmin), np.asarray(nmax)
    # Root (internal 0) covers everything.
    assert (nmin[0] <= tri_min.min(0) + 1e-6).all()
    assert (nmax[0] >= tri_max.max(0) - 1e-6).all()


def _compare(scene, rays=128, seed=21):
    cfg = ComputeConfig()
    arrays = scene.pack()
    naive = get_handler("naive")
    _, na = naive.build(scene, arrays)
    naive_fn = naive.intersect_fn(None, na, cfg)
    h = get_handler("lbvh", interpret=True)
    accel, ha = h.build(scene, arrays)
    h_fn = h.intersect_fn(accel, ha, cfg)

    rng = np.random.default_rng(seed)
    o = rng.normal(size=(rays, 3), scale=8.0).astype(np.float32)
    d = rng.normal(size=(rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    excl = jnp.zeros((rays,), dtype=jnp.int32)
    ones = jnp.ones((rays,), dtype=bool)
    t0, _ = naive_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    t1, _ = h_fn(jnp.asarray(o), jnp.asarray(d), excl, ones)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5)


def test_lbvh_matches_naive_default(default_scene):
    _compare(default_scene)


def test_lbvh_matches_naive_teatime(teatime_scene):
    _compare(teatime_scene, rays=96, seed=22)


def test_device_built_bvh_data(teatime_scene):
    """build_bvh_device (Morton + Karras emit + refit on device, host
    preorder flatten) yields a structurally valid, checkpoint-
    serializable BvhData the handlers can consume."""
    import json
    import tempfile

    from rt_rs_tpu.bvh.device import build_bvh_device

    data = build_bvh_device(teatime_scene)
    p = teatime_scene.num_prims
    assert data.num_nodes == 2 * p - 1
    # Every prim in exactly one leaf.
    assert sorted(data.indices.tolist()) == list(range(p))
    leaf = data.is_leaf()
    assert int(leaf.sum()) == p
    assert (data.item_count[leaf] == 1).all()
    # Preorder invariant: children at strictly larger indices.
    interior = ~leaf
    assert (data.fst[interior] > np.arange(data.num_nodes)[interior]).all()
    assert (data.snd[interior] > np.arange(data.num_nodes)[interior]).all()
    # Refit bounds cover children.
    for name in ("fst", "snd"):
        ch = getattr(data, name)[interior]
        assert (
            data.bounds_min[interior] <= data.bounds_min[ch] + 1e-6
        ).all()
        assert (
            data.bounds_max[interior] >= data.bounds_max[ch] - 1e-6
        ).all()
    # Checkpoint round-trip.
    with tempfile.NamedTemporaryFile("w+", suffix=".bvh.json") as f:
        data.save(f.name)
        loaded = type(data).load(f.name)
        json.load(open(f.name))  # valid JSON
    np.testing.assert_array_equal(loaded.indices, data.indices)
    np.testing.assert_array_equal(loaded.fst, data.fst)


def test_device_built_bvh_renders(default_scene):
    """The device-built tree drives both the threaded and packet
    handlers to naive-equal images."""
    from rt_rs_tpu.bvh.device import build_bvh_device

    data = build_bvh_device(default_scene)
    w, h = 32, 24
    cfg = Config(resolution=Resolution.sized(w, h))
    ref = np.asarray(
        Renderer(default_scene, config=cfg, handler="naive").render_frame()
    )
    for handler, kwargs in (
        ("bvh", dict(data=data)),
        ("pbvh", dict(data=data, interpret=True)),
    ):
        img = np.asarray(
            Renderer(
                default_scene, config=cfg, handler=handler,
                handler_kwargs=kwargs,
            ).render_frame()
        )
        np.testing.assert_allclose(img, ref, atol=1e-5)


def test_dynamic_refit_matches_rebuild(default_scene):
    """refit=True (frozen rest-pose order, per-frame bounds only) must
    render identically to the full per-frame rebuild."""
    w, h = 32, 24
    cfg = Config(resolution=Resolution.sized(w, h))
    dyn_refit = DynamicRenderer(
        default_scene, config=cfg, interpret=True, refit=True
    )
    dyn_full = DynamicRenderer(
        default_scene, config=cfg, interpret=True
    )
    shift = np.array([0.4, 0.2, -0.3], dtype=np.float32)
    moved = default_scene.vert_pos + shift
    np.testing.assert_allclose(
        np.asarray(dyn_refit.render_frame(moved)),
        np.asarray(dyn_full.render_frame(moved)),
        atol=1e-5,
    )


def test_dynamic_rebuild(default_scene):
    """Moving the geometry and rebuilding on-device must equal a
    from-scratch render of the moved scene."""
    w, h = 32, 24
    dyn = DynamicRenderer(
        default_scene,
        config=Config(resolution=Resolution.sized(w, h)),
        interpret=True,
    )
    shift = np.array([0.5, -0.25, 0.3], dtype=np.float32)
    moved = default_scene.vert_pos + shift

    frame_dyn = np.asarray(dyn.render_frame(moved))

    import copy

    moved_scene = copy.deepcopy(default_scene)
    moved_scene.vert_pos = moved
    frame_ref = np.asarray(
        Renderer(
            moved_scene,
            config=Config(resolution=Resolution.sized(w, h)),
            handler="naive",
        ).render_frame()
    )
    np.testing.assert_allclose(frame_dyn, frame_ref, atol=1e-5)

    # And animating back to the original matches the static render.
    frame_back = np.asarray(dyn.render_frame(default_scene.vert_pos))
    frame_static = np.asarray(
        Renderer(
            default_scene,
            config=Config(resolution=Resolution.sized(w, h)),
            handler="naive",
        ).render_frame()
    )
    np.testing.assert_allclose(frame_back, frame_static, atol=1e-5)


def test_lbvh_tiled_and_rows_match_gather(teatime_scene):
    """Round-3: the lbvh handler runs on the tuned packet kernel with a
    native tiled entry, on-device attr table, and rows/any-hit — same
    contracts as pbvh (VERDICT round-2 item 1)."""
    from rt_rs_tpu.ops import shade

    cfg = ComputeConfig()
    arrays = teatime_scene.pack()
    h = get_handler("lbvh", interpret=True)
    assert h.block_lanes == 256  # tuned ray tile
    accel, arr2 = h.build(teatime_scene, arrays)
    # Tuned chunk height + on-device attr table present.
    assert accel.comp.shape[1] == 64
    assert accel.attr_t is not None

    pos = jnp.asarray(teatime_scene.camera.pos, jnp.float32)
    at = jnp.asarray(teatime_scene.camera.at, jnp.float32)
    rows_fn = h.intersect_tiled_rows_fn(accel, arr2, cfg)
    anyhit_fn = h.intersect_tiled_anyhit_fn(accel, arr2, cfg)
    assert rows_fn is not None and anyhit_fn is not None
    base = shade.render_tiled(
        arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg, pos, at,
        48, 32, ray_tile=256, block=(16, 16), interpret=True,
    )
    fast = shade.render_tiled(
        arr2, h.intersect_tiled_fn(accel, arr2, cfg), cfg, pos, at,
        48, 32, ray_tile=256, block=(16, 16), interpret=True,
        intersect_rows_fn=rows_fn,
        intersect_anyhit_fn=anyhit_fn,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base), atol=2e-6)


def test_lbvh_renderer_matches_naive(default_scene):
    """End-to-end Renderer equality on the lbvh tiled path."""
    cfg = Config(resolution=Resolution.sized(48, 32))
    ref = np.asarray(
        Renderer(default_scene, config=cfg, handler="naive").render_frame()
    )
    img = np.asarray(
        Renderer(
            default_scene, config=cfg, handler="lbvh",
            handler_kwargs={"interpret": True},
        ).render_frame()
    )
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_dynamic_rows_path_matches(default_scene):
    """DynamicRenderer's rows/any-hit branch (the default at every
    size since the late-round-3 re-sweep) must equal the gather branch
    (force_rows=False)."""
    w, h = 32, 24
    cfg = Config(resolution=Resolution.sized(w, h))
    base = np.asarray(
        DynamicRenderer(
            default_scene, config=cfg, interpret=True, force_rows=False
        ).render_frame(default_scene.vert_pos)
    )
    for refit in (False, True):
        dyn = DynamicRenderer(
            default_scene, config=cfg, interpret=True, refit=refit,
            force_rows=True,
        )
        np.testing.assert_allclose(
            np.asarray(dyn.render_frame(default_scene.vert_pos)), base,
            atol=2e-6,
        )


def test_dynamic_rows_rejects_nonfinite_inputs(default_scene):
    """Rows enabled + non-finite per-frame vertex data must fail loud
    (the per-frame attr build would otherwise NaN-poison whole tiles
    through the rows matmul — see build_tri_chunks); the gather path
    (force_rows=False) renders such geometry fine."""
    cfg = Config(resolution=Resolution.sized(32, 24))
    dyn = DynamicRenderer(
        default_scene, config=cfg, interpret=True, force_rows=True
    )
    vp = np.asarray(default_scene.vert_pos, np.float32)
    bad_norm = np.asarray(default_scene.vert_norm, np.float32).copy()
    bad_norm[0] = np.nan  # the degenerate-face import outcome
    with pytest.raises(ValueError, match="non-finite"):
        dyn.render_frame(vp, bad_norm)
    # The gather path accepts the same input (NaN confined to pixels
    # hitting the degenerate prim; positions stay finite so the
    # on-device Morton build is unaffected).
    dyn_g = DynamicRenderer(
        default_scene, config=cfg, interpret=True, force_rows=False
    )
    frame = np.asarray(dyn_g.render_frame(vp, bad_norm))
    # NaN is confined to pixels hitting the degenerate prim; the rest
    # of the frame still renders lit geometry.
    assert np.nan_to_num(frame).sum() > 0


def test_lbvh_attr_cap_scales_with_tri_chunk(teatime_scene):
    """The with-attrs cap is byte-true at the actual chunk height:
    teatime (6,320 tris) fits attrs at tc=64 (cap 8,192) but NOT at
    tc=16 (attr_t is 16 KB/chunk -> cap 4,096) — building an attr
    table the rows path then rejects would waste device memory."""
    from rt_rs_tpu.handlers.lbvh import LbvhIntrs

    arrays = teatime_scene.pack()
    acc64, _ = LbvhIntrs(interpret=True, tri_chunk=64).build(
        teatime_scene, arrays
    )
    assert acc64.attr_t is not None
    acc16, _ = LbvhIntrs(interpret=True, tri_chunk=16).build(
        teatime_scene, arrays
    )
    assert acc16.attr_t is None
