#!/bin/bash
# Tunnel-recovery gate for the round-3 TPU queue: idle first (degraded
# tunnels recover only with NO TPU processes running, CLAUDE.md), then
# one probe with a timeout long enough to survive a multi-minute first
# op (killing a stalled probe re-degrades the tunnel), then the queue.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/tpu_gate.log
: > "$LOG"
echo "idle wait start $(date)" >> "$LOG"
sleep "${IDLE_S:-1500}"
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
  echo "TUNNEL STILL DEGRADED — not running the queue" >> "$LOG"
  exit 1
fi
bash experiments/tpu_session_r3.sh
