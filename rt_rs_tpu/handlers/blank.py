"""The no-op backend: every ray misses.

Parity with ``BlankIntrs`` (``src/lib/handlers/blank.rs``), which exists
to measure the fixed overhead of everything *around* intersection — the
benchmark baseline of the study (pdf §4.2.1).  It is also the default
handler of the ``load`` tool (``src/tools/load.rs:189-192``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers.base import IntrsHandler, IntrsStats
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.scene.arrays import SceneArrays


class BlankIntrs(IntrsHandler):
    name = "Blank"

    def build(self, scene: Scene, arrays: SceneArrays):
        return None, arrays

    def stats(self, accel: Any) -> IntrsStats:
        return IntrsStats(name="Blank", size=0)

    def intersect_fn(self, accel, arrays, cfg: ComputeConfig):
        miss_t = jnp.float32(cfg.t_max + 1.0)

        def intersect(o, d, excl, valid, t_cap=None):
            n = o.shape[0]
            return (
                jnp.full((n,), miss_t, dtype=jnp.float32),
                jnp.zeros((n,), dtype=jnp.int32),
            )

        return intersect

    def intersect_tiled_fn(self, accel, arrays, cfg: ComputeConfig):
        # Native tiled entry: constant misses in the tiled layout, so
        # the overhead probe measures the frame pipeline alone — the
        # base-class AoS adapter would add one [T,r,3] relayout pair
        # per call that no real backend pays.
        miss_t = jnp.float32(cfg.t_max + 1.0)

        def tiled(payload, valid, t_cap=None):
            t_tiles, r = valid.shape
            return (
                jnp.full((t_tiles, r), miss_t, dtype=jnp.float32),
                jnp.zeros((t_tiles, r), dtype=jnp.int32),
            )

        return tiled
