"""Profile the north-star decode step: per-op device-time breakdown.

Builds the bench.py configuration (llama-2-7b int8+int8KV, bs 256, 2K shared
prefix by default), runs the scanned decode hot loop, and prints the xplane
per-op summary plus wall time per step. This is the round-3 tool for attacking
the serial attention stack (VERDICT item 1).

Usage: python scripts/profile_decode.py [--model llama-2-7b] [--bs 256]
       [--shared 2048] [--new 64] [--steps 32] [--no-trace]
"""

from __future__ import annotations

import argparse
import time

import jax

from hydragen_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # TPU only: foreign-host CPU AOT entries can SIGILL

import numpy as np

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import PRESETS
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.utils.timing import _fence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--shared", type=int, default=2048)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--shared-kv", default="follow",
                    choices=("follow", "none", "int8"),
                    help="shared-level KV precision (none = compute dtype; "
                    "the fast+exact choice at long prefixes)")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--levels", type=int, default=1, choices=(1, 2),
                    help="2 = AlphaCode-style hierarchy (level 0: one "
                    "--shared prompt; level 1: --level2-bs distinct "
                    "--level2-shared sub-prompts) — the round-5 tool for "
                    "decomposing the 2-level decode gap (VERDICT r4 weak #5)")
    ap.add_argument("--level2-bs", type=int, default=8)
    ap.add_argument("--level2-shared", type=int, default=256)
    args = ap.parse_args()

    cfg = PRESETS[args.model]
    quant = None if args.quant in ("", "none") else args.quant
    kv_quant = None if args.kv in ("", "none") else args.kv
    params = init_params(cfg, jax.random.PRNGKey(0),
                     quantized=quant or False)
    engine = HydragenLlama(cfg, params, quantization=quant)

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, cfg.vocab_size, size=(1, args.shared)).astype(np.int32)
    level_bs = [1]
    level_lens = [args.shared]
    prompts = [prompt]
    if args.levels == 2:
        assert args.bs % args.level2_bs == 0
        level_bs.append(args.level2_bs)
        level_lens.append(args.level2_shared)
        prompts.append(rng.randint(
            1, cfg.vocab_size, size=(args.level2_bs, args.level2_shared)
        ).astype(np.int32))

    engine.setup_caches(
        max_unique_batch_size=args.bs,
        max_unique_seq_length=args.new,
        max_shared_batch_sizes=level_bs,
        max_shared_seq_lengths=level_lens,
        kv_quant=kv_quant,
        shared_kv_quant=args.shared_kv,
    )

    nrs = args.bs if args.levels == 1 else args.bs // args.level2_bs

    def gen(steps):
        return engine.generate(
            input_ids=prompts,
            num_return_sequences=nrs,
            max_new_tokens=steps,
            temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
        )

    # Warm (compiles prefill + decode programs).
    t0 = time.perf_counter()
    _fence(gen(args.new))
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f} s")

    # Wall time per decode step: difference a short and a full decode run so
    # prefill+sampling fixed costs cancel.
    times = {}
    for steps in (2, args.new):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fence(gen(steps))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    per_step = (times[args.new] - times[2]) / (args.new - 2)
    print(f"decode wall: {per_step*1e3:.2f} ms/step  "
          f"({args.bs/per_step:.0f} tok/s decode-only)")

    if not args.no_trace:
        from hydragen_tpu.utils.profiling import (
            print_op_summary, print_while_summary, trace,
        )

        with trace("/tmp/hydragen_trace_r3"):
            _fence(gen(args.steps))
        print_op_summary("/tmp/hydragen_trace_r3", top=args.top)
        # The decode scan shows as ONE opaque while above; break out its
        # leaf ops per step (the round-4 serial-stack accounting view).
        print_while_summary("/tmp/hydragen_trace_r3", top=args.top,
                            steps=args.steps - 1)


if __name__ == "__main__":
    main()
