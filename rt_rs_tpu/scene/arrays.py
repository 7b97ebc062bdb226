"""Device-resident scene arrays (the bind-group(2) equivalent).

The reference uploads five buffers — camera UBO + prims / vertices /
lights / materials storage buffers (``src/lib/scene/mod.rs:133-272``).
The TPU-native layout is a pytree of SoA ``jax.Array``s with two
deliberate differences:

* Per-primitive corner data is pre-gathered: ``pa/pb/pc`` (positions)
  and ``na/nb/nc`` (normals) are contiguous ``[P, 3]`` arrays, so hot
  kernels never perform ``prim -> vertex`` index chasing (the WGSL does
  this gather per ray per test, ``compute.wgsl:124-126, 144-146``; on
  TPU we hoist it to pack time since the mesh is static per frame).
* The null/miss sentinel prim (material ``-1``) occupies row 0, same
  convention as ``scene/mod.rs:161-166``, so "prim id 0" always means
  miss and gathers need no bounds branches.

The camera is intentionally *not* part of this pytree — it changes every
frame (orbit), so it is a separate small argument to the jitted step,
mirroring the reference's live camera buffer writes
(``state/mod.rs:718-728``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneArrays:
    # Per-prim (row 0 = null sentinel): material id, corner positions,
    # corner normals.  [P, 3] float32 / [P] int32.
    prim_mat: jax.Array
    pa: jax.Array
    pb: jax.Array
    pc: jax.Array
    na: jax.Array
    nb: jax.Array
    nc: jax.Array
    # Lights: [L, 3] / [L]
    light_pos: jax.Array
    light_strength: jax.Array
    # Materials: [M, 3] / [M, 3] / [M]  (M >= 1; padded with a dummy)
    mat_color: jax.Array
    mat_albedo: jax.Array
    mat_spec: jax.Array

    @property
    def num_prims(self) -> int:
        """Prim count *including* the null sentinel at row 0."""
        return int(self.prim_mat.shape[0])

    @property
    def num_lights(self) -> int:
        return int(self.light_strength.shape[0])

    @classmethod
    def from_scene(cls, scene) -> "SceneArrays":
        p = scene.num_prims
        idx = scene.prim_indices.astype(np.int64)
        vp = scene.vert_pos.astype(np.float32)
        vn = scene.vert_norm.astype(np.float32)

        def corner(arr: np.ndarray, c: int) -> np.ndarray:
            out = np.zeros((p + 1, 3), dtype=np.float32)
            if p:
                out[1:] = arr[idx[:, c]]
            return out

        prim_mat = np.full((p + 1,), -1, dtype=np.int32)
        if p:
            prim_mat[1:] = scene.prim_material

        m = scene.mat_color.shape[0]
        mat_color = scene.mat_color.astype(np.float32)
        mat_albedo = scene.mat_albedo.astype(np.float32)
        mat_spec = scene.mat_spec.astype(np.float32)
        if m == 0:
            mat_color = np.zeros((1, 3), dtype=np.float32)
            mat_albedo = np.zeros((1, 3), dtype=np.float32)
            mat_spec = np.zeros((1,), dtype=np.float32)

        return cls(
            prim_mat=jnp.asarray(prim_mat),
            pa=jnp.asarray(corner(vp, 0)),
            pb=jnp.asarray(corner(vp, 1)),
            pc=jnp.asarray(corner(vp, 2)),
            na=jnp.asarray(corner(vn, 0)),
            nb=jnp.asarray(corner(vn, 1)),
            nc=jnp.asarray(corner(vn, 2)),
            light_pos=jnp.asarray(scene.light_pos.astype(np.float32).reshape(-1, 3)),
            light_strength=jnp.asarray(scene.light_strength.astype(np.float32)),
            mat_color=jnp.asarray(mat_color),
            mat_albedo=jnp.asarray(mat_albedo),
            mat_spec=jnp.asarray(mat_spec),
        )

    def byte_size(self) -> int:
        """Total geometry bytes, for `IntrsStats`-style reporting."""
        return sum(
            int(np.prod(f.shape)) * f.dtype.itemsize
            for f in jax.tree_util.tree_leaves(self)
        )
