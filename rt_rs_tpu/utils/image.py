"""PNG image IO.

The reference presents frames through a wgpu surface blit
(``src/lib/shaders/render.wgsl``); headless TPU rendering writes PNGs
instead.  Row 0 of the array is texture row ``y = 0``, matching the
storage-texture coordinates of ``compute.wgsl:284-293``.
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, image: np.ndarray) -> None:
    """Write an ``[H, W, 3] uint8`` image."""
    from PIL import Image

    Image.fromarray(image, mode="RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def golden_diff_ok(
    img: np.ndarray,
    golden: np.ndarray,
    *,
    allow_edge_flips: bool = False,
    edge_px_frac: float = 0.005,
) -> tuple[bool, str]:
    """Compare a render against a golden image.

    The strict criterion (``max <= 2`` per channel, <2% of values off)
    is what the Pallas kernel paths hold bit-exactly across backends.
    Scenes that route through the XLA ``shade.trace`` fallback (negative
    materials — renderer.py:107) are compiled per backend, and XLA's
    f32 scheduling (FMA contraction) legitimately flips knife-edge
    hit/miss pixels between CPU goldens and TPU renders.  With
    ``allow_edge_flips`` a small budget (``edge_px_frac``) of such
    pixels passes IF each one lies on a contrast edge of the golden:
    some 8-neighbor of the golden matches the rendered value within the
    strict tolerance, i.e. the render picked the other side of a real
    boundary — any non-edge divergence (wrong shading, wrong color)
    still fails.  Returns ``(ok, detail)``."""
    img = img.astype(np.int64)
    golden = golden.astype(np.int64)
    diff = np.abs(img - golden)
    detail = f"max {diff.max()} ({(diff > 0).mean():.2%} px)"
    if diff.max() <= 2 and (diff > 0).mean() < 0.02:
        return True, detail
    if not allow_edge_flips:
        return False, detail
    bad = np.argwhere(diff.max(axis=-1) > 2)
    if len(bad) > edge_px_frac * diff.shape[0] * diff.shape[1]:
        return False, detail + f", {len(bad)} flipped px over budget"
    h, w = golden.shape[:2]
    for y, x in bad:
        neigh = golden[
            max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2
        ].reshape(-1, 3)
        if not (np.abs(neigh - img[y, x]).max(axis=-1) <= 2).any():
            return False, detail + f", non-edge divergence at ({y},{x})"
    return True, detail + f", {len(bad)} edge flips OK"
