#!/bin/bash
# Round-3 TPU measurement queue (run when the axon tunnel is healthy).
# Generous per-step timeouts: timeout-killed TPU processes degrade the
# tunnel (CLAUDE.md), so prefer waiting over killing.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/tpu_session_r3.log
: > "$LOG"
run() {
  echo "=== $* ($(date)) ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ($(date)) ---" >> "$LOG"
}
# 1. compiled-kernel correctness gate (shadow cull + refine tags)
run python -m rt_rs_tpu.tools.tpu_check
# 2. handler table with the bvh/rf_bvh refine fix
run python -u experiments/handler_table.py
# 3. dynamic-path refine A/B
run python -u experiments/dynamic_refine_ab.py
# 4. refine all-vs-bounces at 384x288 with shadow cull in place
run python -u experiments/refine_ab.py small
# 5. tri_chunk + ray_tile re-sweeps
run python -u experiments/tc_resweep.py small
run python -u experiments/tc_resweep.py rt
run python -u experiments/tc_resweep.py dual
run python -u experiments/tc_resweep.py 1080
run python -u experiments/tc_resweep.py dual1080
run python -u experiments/tc_resweep.py seg
run python -u experiments/tc_resweep.py dualseg
run python -u experiments/rows_crossover.py
# 6. blank-handler in-graph decomposition (the small-frame fixed cost)
run env TRACE_W=384 TRACE_H=288 python -u experiments/trace_small_frame.py blank
# 7. headline bench
run python bench.py
echo "ALL DONE $(date)" >> "$LOG"
