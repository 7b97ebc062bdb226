"""Reproduce the study's handler-comparison table on TPU (pdf p.19
§4.2.2): per-frame time for every backend on default + teatime at
384x288, 4 bounces, orbit-averaged, plus the handler byte footprint
(§4.1 Fig. 8)."""
import math
import time

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync


def orbit_ms(r, frames=40):
    out = r.render_frame(block=False)
    device_sync(out)
    mult = 2.0 * math.pi / frames / 0.0314
    t0 = time.perf_counter()
    for _ in range(frames):
        out = r.render_frame(block=False)
        r.orbit(mult)
    device_sync(out)
    return (time.perf_counter() - t0) / frames * 1e3


if __name__ == "__main__":
    for name in ("default", "teatime"):
        scene_path = f"/root/reference/scenes/{name}.json"
        for handler in ("blank", "naive", "bvh", "rf_bvh", "pbvh", "lbvh"):
            frames = 40 if handler != "naive" else 6
            r = Renderer(
                Scene.load(scene_path),
                config=Config(resolution=Resolution.sized(384, 288)),
                handler=handler,
            )
            ms = orbit_ms(r, frames)
            print(
                f"{name} {handler}: {ms:.3f} ms"
                f" ({r.stats.size} B)",
                flush=True,
            )
