"""Laneways tile narrowing for secondary calls (trace_tiled narrow=).

The split is a pure reshape (ray order preserved row-major) and the
per-ray intersect math is unchanged; only the per-sub-tile cull sets
differ — conservatively, so each ray's candidate set still contains
its true closest hit and the (t, smallest-pid) winner is identical.
Eager (interpret-mode) frames must therefore be BIT-exact vs
narrow=None on both the kernel-rows and gather paths.  (Compiled TPU:
~1 ULP fusion drift, same class as refine; gated by tools/tpu_check.)
"""

import numpy as np
import pytest

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene


@pytest.fixture(scope="module")
def teatime(scenes_dir):
    scene = Scene.load(str(scenes_dir / "teatime.json"))
    scene.camera = scene.camera.orbited(25.0)  # side-on (divergent bounces)
    return scene


@pytest.mark.parametrize("force_rows", [True, False])
def test_narrow_bit_exact(teatime, force_rows):
    kw = dict(
        config=Config(resolution=Resolution.sized(64, 48)),
        handler="pbvh",
        force_rows=force_rows,
    )
    base = np.asarray(
        Renderer(teatime, **kw).render_frame(block=False)
    )
    nw = np.asarray(
        Renderer(teatime, narrow=128, **kw).render_frame(block=False)
    )
    assert base.any(), "all-black frame"
    np.testing.assert_array_equal(nw, base)


def test_narrow_must_divide(teatime):
    r = Renderer(
        teatime,
        config=Config(resolution=Resolution.sized(64, 48)),
        handler="pbvh",
        narrow=96,
    )
    with pytest.raises(ValueError, match="narrow"):
        r.render_frame(block=False)
