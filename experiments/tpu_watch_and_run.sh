#!/bin/bash
# Watch for the axon relay to come back (ports closed = tunnel down —
# no point spawning TPU processes that fail after 25 min of retries),
# then probe once and run the round-3 measurement queue.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
LOG=/tmp/tpu_watch.log
: > "$LOG"
port_open() {
  (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null && { exec 3>&-; return 0; }
  return 1
}
echo "watch start $(date)" >> "$LOG"
for i in $(seq 1 200); do   # up to ~10 h at 3-min polls
  if port_open; then
    echo "relay port open at $(date); settling 120s" >> "$LOG"
    sleep 120
    echo "probe start $(date)" >> "$LOG"
    timeout 3000 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
s = np.asarray(jnp.sum(jnp.ones((8,8))))
print(f'probe OK {s} after {time.time()-t0:.1f}s', flush=True)
" >> "$LOG" 2>&1
    rc=$?
    echo "probe exit $rc $(date)" >> "$LOG"
    if [ "$rc" -eq 0 ]; then
      bash experiments/tpu_session_r3.sh
      echo "queue finished $(date)" >> "$LOG"
      exit 0
    fi
    # Probe failed though port open: wait a while before retrying.
    sleep 600
  else
    sleep 180
  fi
done
echo "gave up $(date)" >> "$LOG"
exit 1
