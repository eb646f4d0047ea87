#!/bin/bash
# Unattended round-4 TPU measurement plan.
#
# Round-4 themes, in value order:
#   1. Mosaic regression check (decode picker + long-S block_k changed)
#   2. decode-kernel fix validation at the round-3 crash geometries
#      (results/r3_measure/{sweep7b,bench_w4a8,unique_s128_auto} postmortem)
#   3. W8A8 end-to-end: the s8 MXU GEMM measured 223-250 TOP/s standalone
#      (r3 gemm step) but never ran through bench.py — the largest single
#      north-star lever on the table (matmul floor 20 ms -> ~14 ms)
#   4. INT4 weight arms (HBM-OOM fix) + int4-KV 128-new protocol arm
#   5. 16K flatness with the new long-S block_k default
#   6. 7B paper-shape sweep (VERDICT r2 item 4; crashed in r3)
#
# Usage: scripts/r4_measure.sh [--wait]
# Resumable: <step>.done / <step>.fail under results/r4_measure/.
set -u
cd /root/repo
LOG=results/r4_measure
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

# 0. Mosaic lowering regression (decode picker + block_k heuristic changed).
#    Flash oracle cases restricted to bf16 tolerances: the fp32-written
#    cases assert atol=2e-5, which real-TPU bf16 matmul precision cannot
#    meet (they are CPU-suite tests; same restriction as the r3 arm).
step kernels_compile2 2400 env HYDRAGEN_TEST_TPU=1 \
  python -m pytest tests/test_mosaic_lowering.py -q
step kernels_compile_flash 2400 env HYDRAGEN_TEST_TPU=1 \
  python -m pytest tests/test_flash.py -q -k bf16

# 1. Decode-kernel fix validation at the r3 crash geometries.
step unique_s128_auto 1800 python scripts/ubench_unique.py --s 128
step unique_b32_s144 1800 python scripts/ubench_unique.py --b 32 --s 144 \
  --which xla,rowdec
step unique_b8_s304 1800 python scripts/ubench_unique.py --b 8 --s 304 \
  --which xla,rowdec

# 2. Bench regression + the W8A8 arm (the headline lever).
step bench_default 5400 python bench.py
step bench_w8a8 5400 env HYDRAGEN_BENCH_QUANT=w8a8 python bench.py
step bench_w8a8_all 5400 env HYDRAGEN_BENCH_QUANT=w8a8 \
  HYDRAGEN_W8A8_FAMILIES=all python bench.py
step profile_w8a8 5400 python scripts/profile_decode.py --no-trace --quant w8a8
step profile_w8a8_trace 5400 python scripts/profile_decode.py --quant w8a8
step bench_w8a8_new128_kv4 7200 env HYDRAGEN_BENCH_QUANT=w8a8 \
  HYDRAGEN_BENCH_KV=int4 HYDRAGEN_BENCH_NEW=128 python bench.py

# 2b. Kernel-tile probes at the north star, from the round-4 trace
#     decomposition (unique read 9.15 ms/step at 1.7x floor; shared 2K read
#     5.4 ms VPU-bound): DECODE_BLOCK_S=32 lets the clamped index maps skip
#     the unfilled half of the 64-slot window for the first half of decode;
#     FLASH_BLOCK_K raises the shared-read K tile (fewer online-softmax
#     rescale passes — decisive at 16K, untested at 2K).
step bench_w8a8_bs32 5400 env HYDRAGEN_BENCH_QUANT=w8a8 \
  HYDRAGEN_DECODE_BLOCK_S=32 python bench.py
step bench_w8a8_bk1024 5400 env HYDRAGEN_BENCH_QUANT=w8a8 \
  HYDRAGEN_FLASH_BLOCK_K=1024 python bench.py
step bench_w8a8_bk2048 5400 env HYDRAGEN_BENCH_QUANT=w8a8 \
  HYDRAGEN_FLASH_BLOCK_K=2048 python bench.py

# 3. INT4 arms (HBM-OOM + BlockSpec fixes).
step bench_w4a8 5400 env HYDRAGEN_BENCH_QUANT=w4a8 python bench.py
step bench_int4 5400 env HYDRAGEN_BENCH_QUANT=int4 python bench.py
step bench_kv4_new128 7200 env HYDRAGEN_BENCH_KV=int4 HYDRAGEN_BENCH_NEW=128 \
  HYDRAGEN_BENCH_QUANT=w4a8 python bench.py

# 4. 16K flatness with the new long-S block_k default (expect ~17.3 ms from
#    the r3 flat16k_bk1024 arm); probe 2048 for further headroom.
step flat16k_auto 3600 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none
step flat16k_bk2048 3600 env HYDRAGEN_FLASH_BLOCK_K=2048 \
  python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none
step flat1k 3600 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 1024 --no-trace --shared-kv none

# 5. Serving ratio (post-lookahead) at two chunk sizes.
step serving 7200 python scripts/serving_bench.py --chunk 32 --kv-quant int8
step serving_c64 7200 python scripts/serving_bench.py --chunk 64 --kv-quant int8

# 6. Hierarchy showcase refresh on the round-4 engine (r2 point: 8,796 /
#    5,193 / 14,572 tok/s for hydragen / nohierarchy / noattention).
step hier 10800 python scripts/synth.py results/hier_r4 \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --levels 2 --bs 64 --num-shared 2048 --num-unique 64 --mode all

# 7. 7B paper-shape sweep (VERDICT r2 item 4) — the long pole, last.
step sweep7b 28800 python scripts/synth.py results/sweep_r4_7b \
  --preset llama-2-7b --quantization int8 --kv-quant int8 \
  --bs 32:256:x2 --num-shared 1024:16384:x4 --num-unique 128 --mode all

echo "== all steps attempted; summary:"
for f in "$LOG"/*.done; do [ -e "$f" ] && echo "  done: $(basename "$f" .done)"; done
for f in "$LOG"/*.fail; do [ -e "$f" ] && echo "  FAIL: $(basename "$f" .fail) ($(cat "$f"))"; done
