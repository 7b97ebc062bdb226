"""Small vec3 helpers used by host-side (NumPy) code.

Counterpart of the reference's ``V3Ops`` trait
(``src/lib/geom/v3.rs:7-18``).  Device-side math uses ``jnp`` directly;
these helpers exist for the CPU paths (OBJ import, BVH build) where the
reference also stays on the CPU.
"""

from __future__ import annotations

import numpy as np

Vec3 = np.ndarray  # shape (3,) float


def cross(a: Vec3, b: Vec3) -> Vec3:
    return np.cross(a, b)


def dot(a: Vec3, b: Vec3) -> float:
    return float(np.dot(a, b))


def mag(a: Vec3) -> float:
    return float(np.sqrt(np.dot(a, a)))


def normalize(a: Vec3) -> Vec3:
    return np.asarray(a, dtype=np.float64) / mag(a)


def angle(at: Vec3, fst: Vec3, snd: Vec3) -> float:
    """Interior angle at ``at`` of triangle (at, fst, snd).

    Matches ``V3Ops::angle`` (``src/lib/geom/v3.rs:74-79``):
    ``acos(ab·ac / (|ab||ac|))``.
    """
    ab = np.asarray(fst, dtype=np.float64) - at
    ac = np.asarray(snd, dtype=np.float64) - at
    denom = mag(ab) * mag(ac)
    if denom == 0.0:
        return 0.0
    return float(np.arccos(np.clip(np.dot(ab, ac) / denom, -1.0, 1.0)))
