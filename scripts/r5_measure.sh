#!/bin/bash
# Unattended round-5 TPU measurement plan.
#
# Round-5 themes (VERDICT r4 "next round" items), in value order:
#   1. TPU regression incl. the FULL test_flash file (backend-keyed
#      tolerances — a .fail now means a real regression, item 5)
#   2. North-star grind toward >= 8,500 tok/s (item 2): shared activation
#      quantize landed in the layer body — re-run the bench ladder and the
#      family routing arms (the M=256 ladder's w8a8 numbers included a
#      per-projection quantize that is now amortized across q/k/v and
#      gate/up, so qkv may flip to w8a8); DECODE_SUB=8 probe (compile
#      cache amortizes the ~520 s cold Mosaic build); fresh per-leaf trace
#      to name the 1.0 ms of copies.
#   3. 7B protocol cells via int4 KV (item 3): the 16K column and bs-256
#      rows the int8-KV sweep skipped as over-HBM, plus 7B decode-only
#      1K->16K retention.
#   4. Hierarchy-gap decomposition (item 7): profile_decode --levels 2.
#   5. Serving lookahead=2 (item 6): isolate the tunnel-RTT floor.
#
# Usage: scripts/r5_measure.sh [--wait]
# Resumable: <step>.done / <step>.fail under results/r5_measure/.
set -u
cd /root/repo
LOG=results/r5_measure
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

# 0. TPU regression: the FULL flash-oracle file (tolerances now key on the
#    backend — VERDICT r4 item 5's done-criterion) + Mosaic lowering.
step kernels_flash_full 3600 env HYDRAGEN_TEST_TPU=1 \
  python -m pytest tests/test_flash.py -q
step kernels_mosaic 2400 env HYDRAGEN_TEST_TPU=1 \
  python -m pytest tests/test_mosaic_lowering.py -q

# 1. North-star ladder with the shared activation quantize.
step bench_w8a8 5400 python bench.py
# Family re-route arms: the quantize pass is now shared per activation, so
# per-family marginal w8a8 cost dropped — retest qkv and all.
step bench_w8a8_colmajor 5400 env HYDRAGEN_W8A8_FAMILIES=gate,up,wq,wk,wv \
  python bench.py
step bench_w8a8_all 5400 env HYDRAGEN_W8A8_FAMILIES=all python bench.py
# Row sub-unroll depth 8 (r4 ubench: 178-199 us vs 199 at sub=4; cold
# Mosaic compile ~520 s, amortized by the persistent cache).
step bench_w8a8_sub8 7200 env HYDRAGEN_DECODE_SUB=8 python bench.py
# Combination of whatever the above say; start with colmajor+sub8.
step bench_w8a8_colmajor_sub8 7200 env \
  HYDRAGEN_W8A8_FAMILIES=gate,up,wq,wk,wv HYDRAGEN_DECODE_SUB=8 \
  python bench.py

# 2. Fresh per-leaf decode trace (names the copies; re-baselines the
#    serial-stack account after the quantize sharing).
step profile_w8a8_trace 5400 python scripts/profile_decode.py --quant w8a8
step profile_w8a8_sub8 5400 env HYDRAGEN_DECODE_SUB=8 \
  python scripts/profile_decode.py --quant w8a8 --no-trace

# 3. 7B protocol cells via int4 KV (VERDICT item 3): 16K column + bs-256
#    rows + the 128-new arm, w8a8 weights. fits_hbm gates infeasible cells;
#    the int8-KV r4 sweep covers the cells int4 does not change.
step sweep7b_kv4 43200 python scripts/synth.py results/sweep_r5_7b \
  --preset llama-2-7b --quantization w8a8 --kv-quant int4 \
  --bs 32:256:x2 --num-shared 1024:16384:x4 --num-unique 128 --mode all
# 7B decode-only 1K->16K retention (the paper's headline axis at 7B scale;
# previously 1.3B-only).
step flat7b_1k 5400 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 1024 --no-trace
step flat7b_4k 5400 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 4096 --no-trace
step flat7b_16k 7200 python scripts/profile_decode.py --model llama-2-7b \
  --quant w8a8 --kv int4 --shared 16384 --no-trace

# 4. Hierarchy-gap decomposition (VERDICT item 7): per-leaf trace of the
#    2-level decode at the showcase config, plus the flattened baseline's
#    trace for the diff.
step hier_trace 7200 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --quant int8 --kv int8 \
  --levels 2 --bs 64 --shared 2048 --level2-bs 8 --level2-shared 256
step hier_flat_trace 7200 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --quant int8 --kv int8 \
  --bs 64 --shared 2304 --no-trace
# Refresh the 3-mode showcase numbers on the round-5 engine.
step hier 10800 python scripts/synth.py results/hier_r5 \
  --preset sheared-llama-1.3b --quantization int8 --kv-quant int8 \
  --levels 2 --bs 64 --num-shared 2048 --num-unique 64 --mode all

# 5. Serving lookahead (VERDICT item 6): depth 2 isolates the pure transfer
#    RTT (the parsed chunk is guaranteed finished); depth 3 tests whether
#    the residual is depth-limited at all.
step serving_la2 7200 python scripts/serving_bench.py --chunk 32 \
  --kv-quant int8 --lookahead 2
step serving_la3 7200 python scripts/serving_bench.py --chunk 32 \
  --kv-quant int8 --lookahead 3
step serving_c64_la2 7200 python scripts/serving_bench.py --chunk 64 \
  --kv-quant int8 --lookahead 2

# 6. 16K flatness regression at 1.3B (r4: 15.73 ms/step, 63 % retention).
step flat16k 3600 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 16384 --no-trace --shared-kv none
step flat1k 3600 python scripts/profile_decode.py \
  --model sheared-llama-1.3b --shared 1024 --no-trace --shared-kv none

echo "== all steps attempted; summary:"
for f in "$LOG"/*.done; do [ -e "$f" ] && echo "  done: $(basename "$f" .done)"; done
for f in "$LOG"/*.fail; do [ -e "$f" ] && echo "  FAIL: $(basename "$f" .fail) ($(cat "$f"))"; done
