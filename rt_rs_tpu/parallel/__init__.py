"""Multi-chip scaling: image-band sharding over a device mesh.

The reference is strictly single-GPU — its only parallelism is the 2-D
compute dispatch grid (``src/lib/state/mod.rs:704-708``; SURVEY.md §2).
The TPU-native scaling story replaces that with SPMD over a
``jax.sharding.Mesh``:

* the **ray/image axis** is the data-parallel axis: each device renders
  a horizontal band of the frame (camera rays are generated per band,
  so no ray data ever moves between chips);
* **scene + acceleration arrays replicate** (KBs–MBs — they ride the
  initial broadcast, never the per-frame path);
* the only per-frame collective is an optional ``psum`` of luminance
  statistics (exposure metering) — pure ICI, no DCN.

Works on any mesh size that divides the image height; tested on the
8-device virtual CPU mesh (``tests/test_parallel.py``) and dry-run by
the driver via ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rt_rs_tpu.config import ComputeConfig
from rt_rs_tpu.handlers.base import IntrsHandler
from rt_rs_tpu.ops import shade
from rt_rs_tpu.scene.arrays import SceneArrays

RAY_AXIS = "rays"


def image_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the ray/image axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def make_sharded_render(
    handler: IntrsHandler,
    accel: Any,
    arrays: SceneArrays,
    cfg: ComputeConfig,
    width: int,
    height: int,
    mesh: Mesh,
    with_metering: bool = True,
    resolution=None,
    force_rows: bool | None = None,
):
    """Build a jitted multi-chip render step.

    Returns ``fn(camera_pos, camera_at) -> (frame [H, W, 3],
    mean_luminance [])`` with the frame sharded over image bands on
    ``mesh`` and the luminance psum-reduced across devices.

    Per band the step takes the SAME fast-path branches as the
    single-chip ``Renderer._render_jit``: kernel-emitted rows +
    any-hit shadows per the handler's ``rows_default`` on the band's
    pixel count (rows for resident tables, gather for segmented;
    ``force_rows`` overrides).  ``resolution`` (a
    :class:`rt_rs_tpu.config.Resolution`) supplies the user's ``wg``
    pixel-block tuning; default wg=16.
    """
    n_dev = mesh.devices.size
    if height % n_dev != 0:
        raise ValueError(
            f"image height {height} must divide over {n_dev} devices"
        )
    rows_per_dev = height // n_dev

    import jax as _jax

    ray_tile = getattr(handler, "block_lanes", 128)
    use_tiled = arrays.no_negative_materials
    if use_tiled:
        # Tiled frame path per band: the same fused-Pallas fast path as
        # the single-chip Renderer (shading/intersect are elementwise
        # per band, so the sharding story is unchanged: scene + accel
        # replicate, rays are the data-parallel axis).
        intersect_t = handler.intersect_tiled_fn(accel, arrays, cfg)
        interp = _jax.default_backend() != "tpu"
        # Fast-path parity with _render_jit: the heuristic applies to
        # the PER-BAND pixel count (that is what each chip renders).
        use_rows = (
            handler.rows_default(accel, width * rows_per_dev)
            if force_rows is None
            else force_rows
        )
        rows_fn = None
        anyhit_fn = None
        if use_rows:
            rows_fn = handler.intersect_tiled_rows_fn(accel, arrays, cfg)
            if rows_fn is not None:
                anyhit_fn = handler.intersect_tiled_anyhit_fn(
                    accel, arrays, cfg
                )
    else:
        intersect = handler.intersect_fn(accel, arrays, cfg)

    # Pixel-block packet order within each device's band (bit-identical
    # output, tighter packet frusta; see shade.camera_rays), sized to
    # the handler's rays-per-tile, honoring the caller's wg hint.
    from rt_rs_tpu.config import Resolution

    blk = (resolution or Resolution()).block(ray_tile)

    def band_render(row0, camera_pos, camera_at):
        # row0: [1] per-device band start (sharded scalar).
        if use_tiled:
            payload, valid, n_pixels = shade.camera_ray_tiles(
                camera_pos, camera_at, width, height, ray_tile,
                y_offset=row0[0], rows=rows_per_dev, block=blk,
            )
            color = shade.trace_tiled(
                arrays, intersect_t, cfg, payload, valid, camera_pos,
                interpret=interp,
                intersect_rows_fn=rows_fn,
                intersect_anyhit_fn=anyhit_fn,
            )
            flat = color.reshape(3, -1)[:, :n_pixels].T
            band = shade.unblock_colors(flat, width, rows_per_dev, blk)
        else:
            o, d = shade.camera_rays(
                camera_pos, camera_at, width, height,
                y_offset=row0[0], rows=rows_per_dev, block=blk,
            )
            color = shade.trace(arrays, intersect, cfg, o, d)
            band = shade.unblock_colors(color, width, rows_per_dev, blk)
        if with_metering:
            # Cross-chip collective (ICI): global mean luminance for
            # exposure metering.
            lum = jnp.mean(
                band @ jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
            )
            lum = jax.lax.pmean(lum, RAY_AXIS)
        else:
            lum = jnp.float32(0.0)
        return band, lum

    sharded = shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P()),
        # pallas_call out_shapes carry no varying-mesh-axes metadata;
        # skip the vma check (specs above are the contract).
        check_vma=False,
    )

    row0 = jnp.arange(n_dev, dtype=jnp.int32) * rows_per_dev

    @jax.jit
    def render(camera_pos, camera_at):
        frame, lum = sharded(row0, camera_pos, camera_at)
        return frame, lum[0] if lum.ndim else lum

    return render


def sharded_render_scene(
    scene,
    handler: IntrsHandler,
    cfg: ComputeConfig,
    width: int,
    height: int,
    mesh: Mesh | None = None,
):
    """Convenience: pack + build + sharded render of one frame."""
    mesh = mesh or image_mesh()
    arrays = scene.pack()
    accel, arrays = handler.build(scene, arrays)
    fn = make_sharded_render(
        handler, accel, arrays, cfg, width, height, mesh
    )
    frame, lum = fn(
        jnp.asarray(scene.camera.pos, jnp.float32),
        jnp.asarray(scene.camera.at, jnp.float32),
    )
    return frame, lum
