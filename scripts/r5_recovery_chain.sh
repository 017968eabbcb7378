#!/bin/bash
# Round-5 recovery chain: the 2026-08-19 ~23:00 tunnel outage killed the
# base-encoder IR bench mid-rerank.  This script waits for the TPU backend
# to come back (cheap probe every 2 min), re-runs the base bench (the
# workdir reuses the already-built stores), runs the large-encoder bench,
# and touches /tmp/r5_irbench_done to release the original final chain
# (scripts/r5_final_chain.sh: winner pick -> BEIR run -> IRBENCH_r05).
set -u
cd /root/repo

export RAGLITE_TPU_RERANK_CACHE=1024

echo "$(date -u +%FT%TZ) waiting for TPU backend..."
while true; do
  if timeout 120 python -c "import jax.numpy as jnp; jnp.arange(8.0).sum().block_until_ready()" \
      > /dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) TPU backend is back"
    break
  fi
  sleep 120
done

run_with_watchdog() {
  # $1 = log file, rest = command.  Kills the run if it makes <2s of CPU
  # progress over 15 min (the wedged-compile signature) and retries once.
  local log="$1"; shift
  local attempt
  for attempt in 1 2; do
    "$@" > "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      local u0 u1
      u0=$(awk '{print $14}' "/proc/$pid/stat" 2>/dev/null || echo 0)
      sleep 900
      kill -0 "$pid" 2>/dev/null || break
      u1=$(awk '{print $14}' "/proc/$pid/stat" 2>/dev/null || echo 0)
      if [ $((u1 - u0)) -lt 200 ]; then
        echo "$(date -u +%FT%TZ) watchdog: no CPU progress in 15 min, killing $pid (attempt $attempt)"
        kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    if [ $rc -eq 0 ]; then return 0; fi
    echo "$(date -u +%FT%TZ) run failed rc=$rc (attempt $attempt): $*"
    sleep 120
  done
  return 1
}

run_with_watchdog /tmp/r5_irbench_base3.log \
  python scripts/semantic_ir_bench.py \
  --docs 2122 --queries 1000 --adapter-queries 1000 --skip-hash \
  --embedder flax:/root/repo/data/encoder_train_base/export_maxsim \
  --workdir data/irbench_r5_base

run_with_watchdog /tmp/r5_irbench_large.log \
  python scripts/semantic_ir_bench.py \
  --docs 2122 --queries 1000 --adapter-queries 1000 --skip-hash \
  --embedder flax:/root/repo/data/encoder_train_large/export \
  --workdir data/irbench_r5_large

if [ -f data/irbench_r5_base/results.json ] && [ -f data/irbench_r5_large/results.json ]; then
  echo done > /tmp/r5_irbench_done
  echo "$(date -u +%FT%TZ) irbench done; final chain released"
else
  echo "$(date -u +%FT%TZ) NOT releasing final chain: results missing"
fi
