"""Round-3 tuning sweep for the 50K-tri segmented scene (VERDICT item
6 precursor): does the static-scene optimum tri_chunk=64 transfer to
the canyon-of-teapots view, and does cull granularity matter when the
prelude runs once per segment?

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python experiments/bigscene_tune.py [part]
part: all | tc | rt
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer

sys.path.insert(0, "/root/repo/experiments")
from measure_round3 import big_scene, static_ms  # noqa: E402

PART = sys.argv[1] if len(sys.argv) > 1 else "all"

big = big_scene()
print(f"big scene: {big.prim_indices.shape[0]} tris", flush=True)

if PART in ("all", "tc"):
    for tc in (32, 64, 128):
        r = Renderer(
            big, config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", handler_kwargs={"tri_chunk": tc},
        )
        ms = static_ms(lambda: r.render_frame(block=False))
        print(f"seg 640x480 static tc={tc}: {ms:.1f} ms", flush=True)

if PART in ("all", "chain"):
    # Cross-segment cap chaining (wavefront front-to-back pruning):
    # each segment's prelude culls chunks beyond the running best.
    import math

    from measure_round3 import orbit

    for chain in (False, True):
        r = Renderer(
            big, config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", handler_kwargs={"chain": chain},
        )
        ms = static_ms(lambda: r.render_frame(block=False))
        mo = orbit(r, 20)
        print(
            f"seg 640x480 chain={chain}: static {ms:.1f} orbit {mo:.1f} ms",
            flush=True,
        )

if PART in ("all", "rt"):
    # Tighter frusta (more, narrower tiles) vs fewer list entries.
    for rt, blk in ((128, (8, 16)), (256, (16, 16)), (512, (16, 32))):
        r = Renderer(
            big, config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", handler_kwargs={"ray_tile": rt}, block=blk,
        )
        ms = static_ms(lambda: r.render_frame(block=False))
        print(f"seg 640x480 static rt={rt} blk={blk}: {ms:.1f} ms",
              flush=True)
