"""Re-measure the kernel-emitted-rows crossover under round-3 defaults.

The >=400K-pixel rows heuristic (renderer.rows_default) was swept in
round 2b — BEFORE per-ray refine and the shadow cull reshaped the
secondary calls the rows path splits (lean any-hit shadow + row-emitting
closest hit vs one fused call).  Interleaved A/B per size.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/rows_crossover.py
"""
from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import orbit  # noqa: F401

SCENE = "/root/reference/scenes/teatime.json"

for (w, h, frames) in ((384, 288, 60), (640, 480, 40), (1024, 576, 20),
                       (1920, 1080, 12)):
    rs = {
        fr: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(w, h)),
            handler="pbvh", force_rows=fr,
        )
        for fr in (False, True)
    }
    for rep in range(2):
        for fr, r in rs.items():
            print(f"{w}x{h} rows={fr}: {orbit(r, frames):.2f} ms",
                  flush=True)
