#!/bin/bash
# Round-5 TPU queue: correctness gates first (tpu_check with the new
# lbvh sweep + collapse on/off gates), then the measurement set
# (bench.py with golden_check + session-winner headline, early-exit
# A/B, dynamic chain A/B, segmented roofline).  Probe first — a
# degraded tunnel stalls the first device op for minutes (CLAUDE.md);
# killing a stalled probe re-degrades it, so the timeout is long.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=${LOG:-/tmp/tpu_r5.log}
: > "$LOG"
echo "probe start $(date)" >> "$LOG"
timeout 3000 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
s = np.asarray(jnp.sum(jnp.ones((8,8))))
print(f'probe OK {s} after {time.time()-t0:.1f}s', flush=True)
" >> "$LOG" 2>&1
rc=$?
echo "probe exit $rc $(date)" >> "$LOG"
if [ "$rc" -ne 0 ]; then
  echo "TUNNEL DEGRADED — aborting queue" >> "$LOG"
  exit 1
fi

run() {
  echo "=== $1 start $(date)" >> "$LOG"
  timeout "$2" bash -c "$3" >> "$LOG" 2>&1
  echo "=== $1 exit $? $(date)" >> "$LOG"
}

run tpu_check   2400 "python -u -m rt_rs_tpu.tools.tpu_check"
run bench       2400 "python -u bench.py"
run early_exit  3000 "python -u experiments/early_exit_ab.py all"
run dyn_chain   1800 "python -u experiments/dynamic_chain_ab.py"
run roofline_seg 2400 "python -u experiments/roofline_seg.py both"
echo "queue done $(date)" >> "$LOG"
