"""Orbit-animation writer (GIF / frame sequences).

The reference's visual output is a live window / browser canvas; the
headless equivalents are a frame-sequence dump and an animated GIF of
the orbit — also the artifact the study's "5 orbit rotations" protocol
produces when you want to *see* the benchmark run.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def write_gif(
    path: str,
    frames: list[np.ndarray],
    fps: int = 20,
) -> None:
    """Write uint8 RGB frames as an animated GIF."""
    from PIL import Image

    if not frames:
        raise ValueError("no frames to write")
    images = [Image.fromarray(f, mode="RGB") for f in frames]
    images[0].save(
        path,
        save_all=True,
        append_images=images[1:],
        duration=int(1000 / fps),
        loop=0,
    )


def render_orbit_gif(
    renderer,
    path: str,
    frames: int = 60,
    rotations: float = 1.0,
    fps: int = 20,
) -> list[float]:
    """Render a full camera orbit to a GIF; returns per-frame seconds."""
    from rt_rs_tpu.scene.camera import ORBIT_RATE

    mult = (rotations * 2.0 * math.pi) / frames / ORBIT_RATE
    collected: list[np.ndarray] = []
    times: list[float] = []

    import time

    for _ in range(frames):
        t0 = time.perf_counter()
        image = renderer.render_image()
        times.append(time.perf_counter() - t0)
        collected.append(image)
        renderer.orbit(mult)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    write_gif(path, collected, fps=fps)
    return times
