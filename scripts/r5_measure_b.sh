#!/bin/bash
# Round-5 follow-up arms, run AFTER scripts/r5_measure.sh:
#   - the all-families default flip (measured mid-plan: all 7,758 vs
#     gate,up 7,259) combined with the sub-unroll probe
#   - the deferred 7B kv4 sweep (the 12 h long pole, last)
# Same resumable step discipline / LOG dir as r5_measure.sh.
set -u
cd /root/repo
LOG=results/r5_measure
mkdir -p "$LOG"

step() { # step NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2
  shift 2
  if [ -f "$LOG/$name.done" ]; then
    echo "== skip $name (done)"
    return 0
  fi
  echo "== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    rm -f "$LOG/$name.fail"
    touch "$LOG/$name.done"
    echo "== $name OK ($((SECONDS - t0))s)"
  else
    echo "rc=$? after $((SECONDS - t0))s at $(date -u +%FT%TZ)" >"$LOG/$name.fail"
    echo "== $name FAILED (see $LOG/$name.log)"
  fi
}

# The all-default + sub-unroll combination (likely new headline).
step bench_all_sub8 7200 env HYDRAGEN_DECODE_SUB=8 \
  HYDRAGEN_W8A8_FAMILIES=all python bench.py

# s8-GEMM block tuning: the GEMMs sustain ~250 of ~394 TOP/s at M=256;
# fewer, larger blocks shorten each cell's accumulator-serialized dot
# chain. Standalone ladder first, then e2e.
step gemm_blocks_2048 3600 env HYDRAGEN_GEMM_BLOCK_K=2048 \
  python scripts/ubench_gemm.py --which w8a8 --block-k 2048
step gemm_blocks_n1024 3600 env python scripts/ubench_gemm.py \
  --which w8a8 --block-n 1024 --block-k 2048
step bench_all_bk2048 5400 env HYDRAGEN_GEMM_BLOCK_K=2048 python bench.py
step bench_all_n1024_bk2048 5400 env HYDRAGEN_GEMM_BLOCK_N=1024 \
  HYDRAGEN_GEMM_BLOCK_K=2048 python bench.py
# New-default regression (no env: exercises the flipped default path).
step bench_default_r5 5400 python bench.py
# Quantization-mode ladder refresh on the all-default engine: mixed (int4
# down via w4a8) lost under the old routing; with the shared quantize the
# comparison may flip again.
step bench_mixed_r5 5400 env HYDRAGEN_BENCH_QUANT=mixed python bench.py
# The 128-new capacity arm on the new default (BENCH comparison point).
step bench_all_new128_kv4 7200 env HYDRAGEN_BENCH_KV=int4 \
  HYDRAGEN_BENCH_NEW=128 python bench.py

# Lookahead=1 control on the refactored batcher (la2/la3 measured WORSE —
# 1.49x/1.87x vs r4's 1.168x — retirement lag beats host slack; this
# confirms depth 1 still reproduces r4's ratio on the same code).
step serving_la1 7200 python scripts/serving_bench.py --chunk 32 \
  --kv-quant int8 --lookahead 1

# Hierarchy at 4x the batch (paper's ~1.8x is an 8xA100 large-batch
# number; the r5 trace shows the 2-level machinery itself costs only
# +8 %/step, so the gain should grow with the flattened baseline's
# unique-read share).
step hier_big 10800 python scripts/synth.py results/hier_r5_big \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --levels 2 --bs 256 --num-shared 2048 --num-unique 64 --mode all

# flat7b re-runs (the originals raced a mid-plan edit that shipped bf16
# col scales — Mosaic cannot dynamic-sublane-load packed 16-bit rows; the
# operands are f32 now).
step flat7b_1k 5400 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 1024 --no-trace
step flat7b_4k 5400 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 4096 --no-trace
step flat7b_16k 7200 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 16384 --no-trace

# Deferred 7B kv4 protocol sweep (remove the placeholder marker first).
step sweep7b_kv4_run 43200 python scripts/synth.py results/sweep_r5_7b \
  --preset llama-2-7b --quantization w8a8 --kv-quant int4 \
  --bs 32:256:x2 --num-shared 1024:16384:x4 --num-unique 128 --mode all

echo "== follow-up steps attempted; summary:"
for f in "$LOG"/*.done; do [ -e "$f" ] && echo "  done: $(basename "$f" .done)"; done
for f in "$LOG"/*.fail; do [ -e "$f" ] && echo "  FAIL: $(basename "$f" .fail) ($(cat "$f"))"; done
