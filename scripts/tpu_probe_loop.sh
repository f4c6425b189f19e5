#!/bin/bash
# Probe the axon TPU tunnel until it responds; log status transitions.
# Usage: bash scripts/tpu_probe_loop.sh [interval_s] [logfile]
INTERVAL=${1:-120}
LOG=${2:-/tmp/tpu_probe.log}
echo "[probe] start $(date -u +%FT%TZ) interval=${INTERVAL}s" >> "$LOG"
while true; do
  OUT=$(timeout 300 python - <<'EOF' 2>&1
import time
t0 = time.time()
import jax, jax.numpy as jnp
devs = jax.devices()
x = jnp.ones((1024, 1024))
y = (x @ x).block_until_ready()
print(f"OK devices={devs} matmul_sum={float(y.sum()):.0f} elapsed={time.time()-t0:.1f}s")
EOF
)
  RC=$?
  TS=$(date -u +%FT%TZ)
  if [ $RC -eq 0 ] && echo "$OUT" | grep -q "^OK"; then
    echo "[probe] $TS UP: $(echo "$OUT" | tail -1)" >> "$LOG"
    echo "UP" > /tmp/tpu_status
    exit 0
  else
    echo "[probe] $TS DOWN rc=$RC: $(echo "$OUT" | tail -1 | cut -c1-200)" >> "$LOG"
    echo "DOWN" > /tmp/tpu_status
  fi
  sleep "$INTERVAL"
done
