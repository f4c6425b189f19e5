#!/bin/bash
# Round-5 on-chip work queue (VERDICT r4 #1/#3/#4/#8): waits for the axon
# TPU tunnel, then runs the highest-value-per-minute sequence with bounded
# timeouts, logging each item under outputs/r5_tpu/. Designed to be started
# once in the background at round start so zero TPU time is wasted when the
# round-4 outage ends.
set -u
cd /root/repo
LOGDIR=outputs/r5_tpu
mkdir -p "$LOGDIR"
QLOG="$LOGDIR/queue.log"
say() { echo "[queue] $(date -u +%FT%TZ) $*" >> "$QLOG"; }

say "queue started"

# 1. wait for the tunnel (probe every 120 s; each probe bounded at 300 s)
while true; do
  if timeout 300 python - >> "$QLOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
y = (jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))).block_until_ready()
print("probe OK:", d)
EOF
  then
    say "TPU UP"
    echo "UP" > /tmp/tpu_status
    break
  fi
  say "TPU still down"
  sleep 120
done

run() {
  local name=$1 tmo=$2; shift 2
  say "START $name: $*"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  say "END $name rc=$rc (tail: $(tail -1 "$LOGDIR/$name.log" 2>/dev/null | cut -c1-200))"
  return $rc
}

# 2. committed bench (verifies the round-4 3.79 claim + the round-5 glue
#    changes through the exact artifact the driver runs)
run bench 1500 python bench.py

# 3. stage-2 production step via train_step_accum (round-4 blocker: fused
#    step exceeded the remote compile cap; accum is the landed fix, never
#    yet run at this shape on-chip)
RES_IMG=800 RES_GRID=96 BATCH=8 MC_SX=8 STEPS=3 \
  run stage2_prod 3000 python scripts/profile_stage2.py

# 4. stage-3 production step on a compacted export (round-4 OOM fix)
RES_IMG=800 RES_GRID=96 BATCH=8 STEPS=3 SPP_X=16 \
  run stage3_prod 3000 python scripts/profile_stage3.py

# 5. stage-1 A/B of the round-5 glue changes (blocked cumsum + seg_start
#    binary search) at the committed-bench shape/procedure
PAIRS_BUDGET=1400000 KC=128 STEPS=5 \
  run stage1_ab 1800 python scripts/profile_stage1.py

# 6. prior variant at >= 1M gaussians (VERDICT #8)
run prior_1m 2400 python scripts/prior_scale_demo.py

say "queue done — quality chain / eval.sh are launched interactively"
