#!/bin/bash
# Round-5 final arms: validate the flipped defaults (w8a8 all families,
# GEMM tiles (1024, 2048), decode sub-unroll 8) with NO env overrides —
# this is the configuration the driver's BENCH_r05 run will hit, so the
# arm also warms the persistent compile cache for it — then the deferred
# 12 h 7B kv4 protocol sweep, last.
set -u
cd /root/repo
LOG=results/r5_measure
mkdir -p "$LOG"

step() {
  local name=$1 tmo=$2
  shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    rm -f "$LOG/$name.fail"; touch "$LOG/$name.done"
    echo "== $name OK ($((SECONDS - t0))s)"
  else
    echo "rc=$? after $((SECONDS - t0))s at $(date -u +%FT%TZ)" >"$LOG/$name.fail"
    echo "== $name FAILED (see $LOG/$name.log)"
  fi
}

step bench_final 7200 python bench.py
step profile_final 7200 python scripts/profile_decode.py --quant w8a8
# Quality gate on the shipped mode (all-family w8a8 + the r5 tile
# defaults): ce-delta vs the bf16 engine must stay inside the bound.
step quality_final 7200 python scripts/quality.py --quantization w8a8 \
  --kv-quant int8
# Microbenchmark refresh on the r5 kernels (paper Fig. 5 protocol).
step microbench_r5 10800 python scripts/microbenchmark.py \
  results/microbench_r5 --bs 512,2048 --num-shared 2048,8192 \
  --num-unique 128

# Hierarchy at 4x the batch (re-run: the first attempt was skipped by an
# HBM pre-flight that mis-priced level-1 as per-row unique KV for every
# mode; fits_hbm now mirrors bench_point's actual allocation).
step hier_big 10800 python scripts/synth.py results/hier_r5_big \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --levels 2 --bs 256 --num-shared 2048 --num-unique 64 --mode all

step sweep7b_kv4_c 43200 python scripts/synth.py results/sweep_r5_7b \
  --preset llama-2-7b --quantization w8a8 --kv-quant int4 \
  --bs 32:256:x2 --num-shared 1024:16384:x4 --num-unique 128 --mode all

echo "== final arms attempted; summary:"
for f in "$LOG"/*.fail; do [ -e "$f" ] && echo "  FAIL: $(basename "$f" .fail)"; done
