"""Golden-image regression gates.

The scalar oracle (tests/oracle.py) is the semantic authority but slow;
these goldens pin the full pipeline's output cheaply.  They were
rendered with the naive (brute-force) backend — itself oracle-verified
in test_render.py — on CPU at 64x48.
"""

import numpy as np
import pytest

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.image import read_png

GOLDENS = "tests/goldens"


@pytest.mark.parametrize("name", ["default", "teatime"])
@pytest.mark.parametrize("handler,kwargs", [
    ("naive", {}),
    ("bvh", {}),
    ("pbvh", {"interpret": True}),
])
def test_golden(scenes_dir, name, handler, kwargs):
    golden = read_png(f"{GOLDENS}/{name}_64x48.png")
    r = Renderer(
        Scene.load(str(scenes_dir / f"{name}.json")),
        config=Config(resolution=Resolution.sized(64, 48)),
        handler=handler,
        handler_kwargs=kwargs,
    )
    img = r.render_image()
    # 8-bit output; tolerate 1 count of rounding jitter on a handful of
    # pixels (backend op-order differences).
    diff = np.abs(img.astype(int) - golden.astype(int))
    assert diff.max() <= 2, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"{(diff > 0).mean():.3%} pixels differ"
