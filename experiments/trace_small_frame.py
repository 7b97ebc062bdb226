"""Capture a jax.profiler trace of the 384x288 teatime frame and print
the top device ops by total duration — the in-graph decomposition the
isolated-call timings (small_frame_profile.py) cannot give.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/trace_small_frame.py
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax

from rt_rs_tpu.config import Config, Resolution
from rt_rs_tpu.renderer import Renderer
from rt_rs_tpu.scene import Scene
from rt_rs_tpu.utils.sync import device_sync

import os

W = int(os.environ.get("TRACE_W", 384))
H = int(os.environ.get("TRACE_H", 288))
TRACE_DIR = "/tmp/jax_trace_small"


def main():
    scene = Scene.load("/root/reference/scenes/teatime.json")
    scene.camera = scene.camera.orbited(25.0)  # side-on view
    kw = {}
    if os.environ.get("TRACE_RETILE"):
        kw["retile"] = os.environ["TRACE_RETILE"] == "1"
    r = Renderer(
        scene, config=Config(resolution=Resolution.sized(W, H)),
        handler=sys.argv[1] if len(sys.argv) > 1 else "pbvh",
        **kw,
    )
    r.camera = scene.camera
    # Warm (compile) first.
    frame = r.render_frame(block=False)
    device_sync(frame)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(20):
            frame = r.render_frame(block=False)
        device_sync(frame)

    # Parse the trace: sum durations per op name on device lines.
    paths = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", TRACE_DIR)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device process ids (TPU/device lines, not python host).
    procs = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in procs.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    print("processes:", procs)
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e["dur"]
        counts[name] += 1
    grand = sum(totals.values())
    print(f"total device op time: {grand/1e3:.2f} ms over 20 frames "
          f"({grand/20e3:.3f} ms/frame)")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/20e3:8.4f} ms/frame  x{counts[name]//20:<3} {name[:110]}")


if __name__ == "__main__":
    main()
