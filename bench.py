"""Headline benchmark: shared-prefix decode throughput, hydragen vs no-sharing.

Mirrors the reference's synthetic e2e protocol
(/root/reference/scripts/synth.py:36-115: one shared prompt, ``bs`` completions,
mode "hydragen" vs "hydragen_noshared") at a scale that fits one chip.

Prints ONE JSON line: value = hydragen decode throughput (tok/s);
vs_baseline = speedup over the disable_hydragen (plain flash-attention)
baseline computing the identical function.

Env overrides: HYDRAGEN_BENCH_BS, HYDRAGEN_BENCH_SHARED, HYDRAGEN_BENCH_NEW,
HYDRAGEN_BENCH_QUANT=int8.
"""

from __future__ import annotations

import json
import os

import jax

# Persistent compilation cache: bench configs recompile identically between
# runs; caching them cuts repeat wall-clock from minutes to seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import PRESETS
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.utils.timing import timed


def run_config(engine, prompt, bs, new_tokens, disable_hydragen, iters=3,
               kv_quant=None):
    shared_len = prompt.shape[1]
    unique_len = new_tokens + 8
    if disable_hydragen:
        unique_len += shared_len
    engine.setup_caches(
        max_unique_batch_size=bs,
        max_unique_seq_length=unique_len,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[shared_len],
        kv_quant=kv_quant,
    )

    def gen():
        return engine.generate(
            input_ids=[prompt],
            num_return_sequences=bs,
            max_new_tokens=new_tokens,
            temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
            disable_hydragen=disable_hydragen,
        )

    times, _ = timed(gen, num_iters=iters, num_warmup=2)
    return bs * new_tokens / min(times)


def main():
    bs = int(os.environ.get("HYDRAGEN_BENCH_BS", "32"))
    shared_len = int(os.environ.get("HYDRAGEN_BENCH_SHARED", "1024"))
    new_tokens = int(os.environ.get("HYDRAGEN_BENCH_NEW", "64"))

    # North-star config (BASELINE.md): INT8 weights. "none" reverts to bf16.
    quant = os.environ.get("HYDRAGEN_BENCH_QUANT", "int8")
    quant = None if quant in ("", "none") else quant
    kv_quant = os.environ.get("HYDRAGEN_BENCH_KV") or None

    cfg = PRESETS["sheared-llama-1.3b"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = HydragenLlama(cfg, params, quantization=quant)

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, cfg.vocab_size, size=(1, shared_len)).astype(np.int32)

    tput = run_config(engine, prompt, bs, new_tokens, disable_hydragen=False,
                      kv_quant=kv_quant)
    base = run_config(engine, prompt, bs, new_tokens, disable_hydragen=True,
                      kv_quant=kv_quant)

    tag = quant or "bf16"
    print(json.dumps({
        "metric": "decode_throughput_1.3b_%s_bs%d_shared%d" % (tag, bs, shared_len),
        "value": round(tput, 1),
        "unit": "tok/s",
        "vs_baseline": round(tput / base, 3),
    }))


if __name__ == "__main__":
    main()
