#!/bin/bash
# Stages 2..4 of ./eval.sh with a stall watchdog (round 5).
#
# The axon tunnel intermittently drops a response mid-run: the client then
# blocks forever in tcp_recvmsg with zero CPU progress (BASELINE.md round-5
# "wedge" postmortem). Compiles are persisted (utils/config.py), and every
# TrainTask checkpoints + resumes, so kill-and-resume is cheap. This driver
# runs each stage CLI, watches its CPU time, kills it after STALL_MIN
# minutes without progress, and relaunches with `resume --dir <latest>`
# when a checkpoint exists.
#
#   nohup scripts/run_chain_watchdog.sh <stage1_output_dir> &
set -u
cd /root/repo
DATA=${DATA:-data/Synthetic4Relight/twosphere}
S1DIR=${1:?usage: run_chain_watchdog.sh <stage1 output dir>}
STALL_MIN=${STALL_MIN:-12}
LOG=outputs/r5_tpu/chain_watchdog.log
say() { echo "[chain] $(date -u +%T) $*" >> "$LOG"; }

latest() { ls -dt outputs/$1/*/ 2>/dev/null | head -1; }

cputime_s() {  # total cpu seconds of pid $1
  awk '{print int(($14+$15)/100)}' /proc/$1/stat 2>/dev/null || echo ""
}

# run_stage <script> <experiment-name> <args...>
# retries with resume on stall; returns 0 when the stage's python exits 0
run_stage() {
  local script=$1 exp=$2; shift 2
  local tries=0
  local -a cmd=(python "scripts/$script" "$@")
  while :; do
    tries=$((tries + 1))
    say "START $script try=$tries: ${cmd[*]}"
    "${cmd[@]}" >> "$LOG.$script" 2>&1 &
    local pid=$! last="" still=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 120
      local now; now=$(cputime_s "$pid")
      if [ -n "$now" ] && [ "$now" = "$last" ]; then
        still=$((still + 1))
      else
        still=0
      fi
      last=$now
      if [ "$still" -ge $((STALL_MIN / 2)) ]; then
        say "STALL $script pid=$pid cputime=$now — killing"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; local rc=$?
    if [ "$rc" -eq 0 ]; then say "DONE $script rc=0"; return 0; fi
    if [ "$tries" -ge 6 ]; then say "GIVE UP $script rc=$rc"; return "$rc"; fi
    # resume from the newest checkpointed run of this experiment if any
    local dir; dir=$(latest "$exp")
    if [ -n "$dir" ] && [ -d "$dir/ckpts" ] && [ -n "$(ls -A "$dir/ckpts" 2>/dev/null)" ]; then
      cmd=(python "scripts/$script" resume --dir "$dir")
      say "RETRY $script via resume --dir $dir"
    else
      say "RETRY $script from scratch (no checkpoint yet)"
    fi
  done
}

say "=== chain watchdog start (stage-1 dir: $S1DIR) ==="
run_stage train_geosplat_mc.py geosplat-mc-s4r-twosphere \
  s4r-twosphere --dataset_path "$DATA" --load "$S1DIR" || exit 1
run_stage train_geosplat_defer.py geosplat-defer-s4r-twosphere \
  s4r-twosphere --dataset_path "$DATA" \
  --load "$(latest geosplat-mc-s4r-twosphere)" || exit 1
say "reliteval"
python scripts/train_geosplat_defer.py reliteval --dataset_path "$DATA" \
  --load "$(latest geosplat-defer-s4r-twosphere)" >> "$LOG.reliteval" 2>&1
say "=== chain done rc=$? ==="
