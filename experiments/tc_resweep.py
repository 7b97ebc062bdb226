"""Static tri_chunk re-sweep WITH per-ray refine + shadow cull.

The tc=64 static optimum predates the per-ray cull refinement: round-2
sweeps ran interval-cull-only lists, where coarse chunks win by
amortizing near-uncullable entries.  Per-ray refine changes the
economics — finer chunks cull far better under divergence
(experiments/chunk_partition.py: cur64 5042 entries vs floor 523 on
the 192x144 batch set) — so the optimum may have moved.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/tc_resweep.py [part]
"""
import sys

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene

from measure_round3 import big_scene, orbit, static_ms  # noqa: F401

SCENE = "/root/reference/scenes/teatime.json"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"
TCS = (64, 32, 16)

if PART in ("all", "small"):
    rs = {
        tc: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler="pbvh", handler_kwargs=dict(tri_chunk=tc),
        )
        for tc in TCS
    }
    for rep in range(2):
        for tc, r in rs.items():
            print(f"384x288 tc={tc}: {orbit(r, 60):.2f} ms", flush=True)

if PART in ("all", "1080"):
    rs = {
        tc: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(1920, 1080)),
            handler="pbvh", handler_kwargs=dict(tri_chunk=tc),
        )
        for tc in TCS
    }
    for rep in range(2):
        for tc, r in rs.items():
            print(f"1080p tc={tc}: {orbit(r, 12):.1f} ms", flush=True)

if PART in ("all", "seg"):
    big = big_scene()
    rs = {
        tc: Renderer(
            big,
            config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh", handler_kwargs=dict(tri_chunk=tc),
        )
        for tc in TCS
    }
    for rep in range(2):
        for tc, r in rs.items():
            print(
                f"seg 640x480 tc={tc}: "
                f"{orbit(r, 12):.1f} ms orbit", flush=True,
            )

if PART in ("all", "rt"):
    # ray_tile re-sweep: 128-ray tiles halve each tile's per-ray list
    # UNION breadth on divergent bounce batches (chunk_partition.py
    # floor analysis) at 2x the tile fixed cost.
    rs = {
        (rt, bw): Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler="pbvh", handler_kwargs=dict(ray_tile=rt),
            block=(rt // bw, bw),
        )
        for (rt, bw) in ((256, 16), (128, 16), (128, 8))
    }
    for rep in range(2):
        for (rt, bw), r in rs.items():
            print(
                f"384x288 ray_tile={rt} block={rt//bw}x{bw}: "
                f"{orbit(r, 60):.2f} ms", flush=True,
            )

if PART in ("all", "dual"):
    # Dual-granularity tables: coarse tc=64 primaries + fine tc for the
    # per-ray-refined bounce/shadow batches (DualTriChunks).
    rs = {
        fine: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(384, 288)),
            handler="pbvh",
            handler_kwargs=(
                {} if fine is None else dict(tri_chunk_fine=fine)
            ),
        )
        for fine in (None, 32, 16, 8)
    }
    for rep in range(2):
        for fine, r in rs.items():
            print(f"384x288 dual fine={fine}: {orbit(r, 60):.2f} ms",
                  flush=True)

if PART in ("all", "dual1080"):
    rs = {
        fine: Renderer(
            Scene.load(SCENE),
            config=Config(resolution=Resolution.sized(1920, 1080)),
            handler="pbvh",
            handler_kwargs=(
                {} if fine is None else dict(tri_chunk_fine=fine)
            ),
        )
        for fine in (None, 16)
    }
    for rep in range(2):
        for fine, r in rs.items():
            print(f"1080p dual fine={fine}: {orbit(r, 12):.1f} ms",
                  flush=True)

if PART in ("all", "dualseg"):
    # Segmented dual tables on the 50K-tri canyon: per-ray refine won
    # 3x here (PERF.md round 3); finer refine chunks may compound.
    big = big_scene()
    rs = {
        fine: Renderer(
            big,
            config=Config(resolution=Resolution.sized(640, 480)),
            handler="pbvh",
            handler_kwargs=(
                {} if fine is None else dict(tri_chunk_fine=fine)
            ),
        )
        for fine in (None, 32, 16)
    }
    for rep in range(2):
        for fine, r in rs.items():
            print(
                f"seg 640x480 dual fine={fine}: "
                f"{orbit(r, 12):.1f} ms orbit", flush=True,
            )
