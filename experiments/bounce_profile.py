"""Per-CALL device timing of the 1080p frame's kernels (round 4).

trace_small_frame.py aggregates device time per op NAME — but the four
bounces' closest-hit calls (and the four shadow any-hit calls) share a
kernel name, so the aggregate cannot say WHERE the intersect budget
goes.  This script buckets each name's events by their per-frame
position (k-th occurrence within a frame, in timestamp order) and
prints the per-position mean — i.e. per-bounce cost — for every name
with more than one call per frame.

Run ON the TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/bounce_profile.py [W H [handler]]
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

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
HANDLER = sys.argv[3] if len(sys.argv) > 3 else "pbvh"
FRAMES = 8
TRACE_DIR = "/tmp/jax_trace_bounce"


def main():
    scene = Scene.load("/root/reference/scenes/teatime.json")
    scene.camera = scene.camera.orbited(25.0)  # side-on worst view
    r = Renderer(
        scene, config=Config(resolution=Resolution.sized(W, H)),
        handler=HANDLER,
    )
    r.camera = scene.camera
    frame = r.render_frame(block=False)  # compile
    device_sync(frame)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(FRAMES):
            frame = r.render_frame(block=False)
        device_sync(frame)

    paths = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    procs = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in procs.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    per_name = defaultdict(list)  # name -> [(ts, dur)]
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        per_name[e["name"]].append((e["ts"], e["dur"]))

    rows = []
    for name, evs in per_name.items():
        if len(evs) % FRAMES or not evs:
            continue
        k = len(evs) // FRAMES
        evs.sort()
        # position j within frame i = event i*k+j (calls don't overlap
        # on the single TPU compute stream).
        pos_ms = [
            sum(evs[i * k + j][1] for i in range(FRAMES)) / FRAMES / 1e3
            for j in range(k)
        ]
        rows.append((sum(pos_ms), name, pos_ms))
    rows.sort(reverse=True)
    grand = sum(t for t, _, _ in rows)
    print(f"{W}x{H} {HANDLER}: total device {grand:.2f} ms/frame")
    for total, name, pos_ms in rows[:14]:
        calls = " ".join(f"{m:7.3f}" for m in pos_ms)
        print(f"{total:8.3f} ms x{len(pos_ms)}  {name[:80]}\n"
              f"          per-call: {calls}")


if __name__ == "__main__":
    main()
