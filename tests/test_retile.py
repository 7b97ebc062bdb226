"""Between-bounce live-tile compaction (shade.trace_tiled retile=).

Whole tiles move, so every per-tile cull set is identical and eager
(interpret-mode) frames must be BIT-exact vs retile=False, on both the
kernel-rows and gather paths.  (On compiled TPU the permutation shifts
XLA fusion boundaries -> ~1 ULP, same class as the refine knob; gated
by tools/tpu_check.)
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
def test_retile_bit_exact(teatime, force_rows):
    kw = dict(
        config=Config(resolution=Resolution.sized(64, 48)),
        handler="pbvh",
        force_rows=force_rows,
    )
    base = np.asarray(
        Renderer(teatime, retile=False, **kw).render_frame(block=False)
    )
    rt = np.asarray(
        Renderer(teatime, retile=True, **kw).render_frame(block=False)
    )
    assert base.any(), "all-black frame"
    np.testing.assert_array_equal(rt, base)


def test_retile_rejects_fuse_bounce(teatime):
    r = Renderer(
        teatime,
        config=Config(resolution=Resolution.sized(64, 48)),
        handler="pbvh",
        retile=True,
        fuse_bounce=True,
    )
    with pytest.raises(ValueError, match="fuse_bounce"):
        r.render_frame(block=False)
