"""A/B: DynamicRenderer.animate(chain=K) (VERDICT round-4 task 5).

The static chain amortized the ~2 ms/frame axon dispatch floor at
384x288 (PERF.md round 4); the dynamic step is one jitted function of
the vertex arrays, so the same trick applies — K rebuild+trace steps
per dispatch over host-stacked [K, V, 3] vertices, orbit advanced
in-graph.  Interleaved triples, teatime 1%-wobble orbit, rebuild AND
refit, 384x288 (1080p measured slower chained on the static path;
sanity-check one chained 1080p rep only if time allows).

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/dynamic_chain_ab.py
"""

import math
import time

import numpy as np

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import DynamicRenderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

SCENE = "/root/reference/scenes/teatime.json"
REPS = 3
FRAMES = 48
K = 16


def wobble_fn(scene):
    rest = np.asarray(scene.vert_pos, np.float32)
    amp = 0.01 * float(np.abs(rest).max())

    def fn(i):
        return rest + amp * np.sin(
            0.1 * i + rest[:, 1:2]
        ).astype(np.float32)

    return fn


def run(refit):
    scene = Scene.load(SCENE)
    cfg = Config(resolution=Resolution.sized(384, 288))
    dr = DynamicRenderer(scene, config=cfg, refit=refit)
    vfn = wobble_fn(scene)
    mult = 2.0 * math.pi / FRAMES / 0.0314
    # compile + warm both paths
    dr.animate(2, orbit_mult=mult, sync_every=2, vertex_fn=vfn)
    dr.animate(K, orbit_mult=mult, sync_every=K, vertex_fn=vfn, chain=K)
    samples = {"loop": [], f"chain={K}": []}
    for _ in range(REPS):
        t = dr.animate(
            FRAMES, orbit_mult=mult, sync_every=FRAMES, vertex_fn=vfn
        )
        samples["loop"].append(float(np.mean(t)) * 1e3)
        t = dr.animate(
            FRAMES, orbit_mult=mult, sync_every=FRAMES, vertex_fn=vfn,
            chain=K,
        )
        samples[f"chain={K}"].append(float(np.mean(t)) * 1e3)
    for k, v in samples.items():
        print(
            f"dynamic refit={refit} {k}: "
            + " ".join(f"{x:.2f}" for x in v)
            + f"  (median {np.median(v):.2f} ms)"
        )


def main():
    for refit in (True, False):
        run(refit)


if __name__ == "__main__":
    main()
