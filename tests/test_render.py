"""End-to-end render vs the scalar oracle (the minimum slice gate)."""

import numpy as np
import pytest

from rt_rs_tpu.config import ComputeConfig, Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from .oracle import Oracle

W, H = 32, 24


@pytest.fixture(scope="module")
def default_scene(scenes_dir):
    return Scene.load(str(scenes_dir / "default.json"))


@pytest.fixture(scope="module")
def oracle_image(default_scene):
    cfg = ComputeConfig()
    oracle = Oracle(default_scene, cfg)
    return oracle.render(W, H, default_scene.camera.pos, default_scene.camera.at)


def test_naive_render_matches_oracle(default_scene, oracle_image):
    r = Renderer(
        default_scene,
        config=Config(resolution=Resolution.sized(W, H)),
        handler="naive",
    )
    frame = np.asarray(r.render_frame())
    assert frame.shape == (H, W, 3)
    # f32 vs f64 and op-order differences allow small drift; the image
    # must agree to ~1e-3 in linear color nearly everywhere.
    diff = np.abs(frame - oracle_image)
    assert np.quantile(diff, 0.99) < 2e-3, (
        f"p99 diff {np.quantile(diff, 0.99)}, max {diff.max()}"
    )
    assert diff.max() < 0.1


def test_blank_render_is_black(default_scene):
    r = Renderer(
        default_scene,
        config=Config(resolution=Resolution.sized(W, H)),
        handler="blank",
    )
    frame = np.asarray(r.render_frame())
    assert (frame == 0.0).all()


def test_render_nonempty(default_scene):
    r = Renderer(
        default_scene,
        config=Config(resolution=Resolution.sized(W, H)),
        handler="naive",
    )
    img = r.render_image()
    assert img.dtype == np.uint8
    assert img.any(), "render produced an all-black image"


def test_orbit_changes_frame(default_scene):
    r = Renderer(
        default_scene,
        config=Config(resolution=Resolution.sized(W, H)),
        handler="naive",
    )
    f0 = np.asarray(r.render_frame())
    r.orbit(10.0)
    f1 = np.asarray(r.render_frame())
    assert not np.allclose(f0, f1)
