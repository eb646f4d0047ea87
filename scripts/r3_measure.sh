#!/bin/bash
# Unattended round-3 TPU measurement plan.
#
# The round-3 perf stack landed CPU-verified while the TPU tunnel was down
# (docs/results_v5e.md "round-3 measurement status"); this script runs the
# ordered value-per-minute checklist the moment hardware is back:
#
#   1. W8A8 decision (ubench_gemm)            6. serving lookahead ratio
#   2. decode block_s sweep (ubench_unique)   7. fused win-or-delete sweeps
#   3. step-time + shared-KV default          8. w8a8 quality gate
#   4. bench.py (BENCH_r03 preview)           9. 7B paper-shape sweep (longest)
#   5. 16K flatness sweep + block_k tuning
#
# Usage: scripts/r3_measure.sh [--wait]
#   --wait  poll until jax sees a non-CPU device before starting.
#
# Resumable: each step writes results/r3_measure/<step>.done on success and
# <step>.fail (and keeps the log) on failure; completed steps are skipped on
# re-run, and the synth sweeps are additionally YAML-per-config resumable.
set -u
cd /root/repo
LOG=results/r3_measure
mkdir -p "$LOG"

if [ "${1:-}" = "--wait" ]; then
  echo "waiting for TPU (probe every 3 min)..."
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
    sleep 180
  done
  echo "TPU up at $(date -u +%FT%TZ)"
fi

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

# 0. Kernel compile check: exp2-space softmax touched every Pallas kernel;
#    surface Mosaic regressions before burning time on benches.
step kernels_compile 2400 env HYDRAGEN_TEST_TPU=1 \
  python -m pytest tests/test_flash.py -q -k bf16

# 1. W8A8 decision: does the s8 Pallas GEMM beat the ~166 TF/s bf16 floor?
step gemm 5400 python scripts/ubench_gemm.py

# 2. Unique-read block_s: can smaller blocks skip the unfilled window tail?
step unique_s128_auto 1800 python scripts/ubench_unique.py --s 128
step unique_s128_b64 1800 env HYDRAGEN_DECODE_BLOCK_S=64 \
  python scripts/ubench_unique.py --s 128
step unique_s128_b32 1800 env HYDRAGEN_DECODE_BLOCK_S=32 \
  python scripts/ubench_unique.py --s 128
# int4 KV read (token-planar pack): half the payload traffic — compare the
# packed GB/s and absolute us against the int8 rows above.
step unique_kv4 1800 python scripts/ubench_unique.py --s 128 --which kv4,kv4xla

# 3. North-star step time; pick the shared-KV default at 2K prefix.
step profile_follow 5400 python scripts/profile_decode.py --no-trace
step profile_sharednone 5400 \
  python scripts/profile_decode.py --no-trace --shared-kv none

# 4. BENCH_r03 preview under both shared-KV settings.
step bench_default 5400 python bench.py
step bench_sharednone 5400 env HYDRAGEN_BENCH_SHARED_KV=none python bench.py

# 5. 16K flatness (VERDICT r2 item 3): decode-only retention 1K->16K, then
#    block_k tuning of the shared read at the 16K point.
step flatness 14400 python scripts/synth.py results/sweep_r3_flat \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --shared-kv none --bs 256 --num-shared 1024:16384:x4 --num-unique 128 \
  --measure-prefill --mode hydragen
step flat16k_bkauto 3600 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none
step flat16k_bk256 3600 env HYDRAGEN_FLASH_BLOCK_K=256 \
  python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none
step flat16k_bk1024 3600 env HYDRAGEN_FLASH_BLOCK_K=1024 \
  python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none

# 6. Serving: one-chunk lookahead vs static (target <= 1.15x at chunk 32).
step serving 7200 python scripts/serving_bench.py --chunk 32 --kv-quant int8

# 7. fused.py win-or-delete (VERDICT r2 item 5): its thesis regime is small
#    batch x large prefix, latency-bound decode.
step fused_auto 10800 python scripts/synth.py results/sweep_r3_fused/auto \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --bs 8:32:x2 --num-shared 8192:16384:x2 --num-unique 128 --mode hydragen
step fused_fused 10800 python scripts/synth.py results/sweep_r3_fused/fused \
  --impl fused \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --bs 8:32:x2 --num-shared 8192:16384:x2 --num-unique 128 --mode hydragen

# 8. Quality gate at scale for the w8a8 / w4a8 modes.
step quality_w8a8 7200 python scripts/quality.py \
  --preset sheared-llama-1.3b --quantization w8a8 --outliers
step quality_w4a8 7200 python scripts/quality.py \
  --preset sheared-llama-1.3b --quantization w4a8 --outliers

# 8b. INT4 weights at the north star (gemm step's w4a8/dq4 rows decide the
#     matmul path; this measures end-to-end at both).
step bench_int4 5400 env HYDRAGEN_BENCH_QUANT=int4 python bench.py
step bench_w4a8 5400 env HYDRAGEN_BENCH_QUANT=w4a8 python bench.py

# 8c. INT4 unique KV at the north star: halves the dominant unique-read
#     HBM term AND fits the protocol's 128-new arm at bs 256; also the
#     full protocol point (int4 weights + int4 KV + 128 new).
step bench_kv4 5400 env HYDRAGEN_BENCH_KV=int4 python bench.py
step bench_kv4_new128 7200 env HYDRAGEN_BENCH_KV=int4 HYDRAGEN_BENCH_NEW=128 \
  HYDRAGEN_BENCH_QUANT=int4 python bench.py
step quality_kv4 7200 python scripts/quality.py \
  --preset sheared-llama-1.3b --kv-quant int4 --outliers

# 9. 7B paper-shape sweep (VERDICT r2 item 4) — the long pole, last.
step sweep7b 28800 python scripts/synth.py results/sweep_r3_7b \
  --preset llama-2-7b --quantization int8 --kv-quant int8 \
  --bs 32:256:x2 --num-shared 1024:16384:x4 --num-unique 128 --mode all

echo "== all steps attempted; summary:"
for f in "$LOG"/*.done; do [ -e "$f" ] && echo "  done: $(basename "$f" .done)"; done
for f in "$LOG"/*.fail; do [ -e "$f" ] && echo "  FAIL: $(basename "$f" .fail) ($(cat "$f"))"; done
