#!/bin/bash
# Post-sweep arms: microbenchmark with enough scan iterations to clear the
# tunnel-noise floor (20 iters measured 0.0 us at bs512/ns2048 — the
# 1x-vs-Nx difference was inside the ~2-30 ms dispatch jitter; CLAUDE.md
# prescribes >=400 iters for sub-100 us ops).
set -u
cd /root/repo
LOG=results/r5_measure
mkdir -p "$LOG"
step() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    rm -f "$LOG/$name.fail"; touch "$LOG/$name.done"; echo "== $name OK ($((SECONDS - t0))s)"
  else
    echo "rc=$? after $((SECONDS - t0))s at $(date -u +%FT%TZ)" >"$LOG/$name.fail"
    echo "== $name FAILED (see $LOG/$name.log)"
  fi
}
step microbench_r5b 14400 python scripts/microbenchmark.py \
  results/microbench_r5b --bs 512,2048 --num-shared 2048,8192 \
  --num-unique 128 --iters 400
echo "== done"
