"""Headline benchmark: shared-prefix decode throughput, hydragen vs no-sharing.

Mirrors the reference's synthetic e2e protocol
(/root/reference/scripts/synth.py:36-115: one shared prompt, ``bs`` completions,
mode "hydragen" vs "hydragen_noshared") at the BASELINE.md north-star config:
Llama-2-7B, INT8 weights + INT8 KV, 2048-token shared prefix, 256 completions.

Prints ONE JSON line: value = hydragen decode throughput (tok/s);
vs_baseline = speedup over the disable_hydragen (plain flash-attention)
baseline computing the identical function. The baseline's batch is halved
until its per-row prefix copy fits HBM (at the north-star scale the
no-sharing KV would need ~140 GB — not fitting IS the result the paper
reports; the baseline therefore runs at its own best feasible batch).

Env overrides: HYDRAGEN_BENCH_MODEL (preset name), HYDRAGEN_BENCH_BS,
HYDRAGEN_BENCH_SHARED, HYDRAGEN_BENCH_NEW,
HYDRAGEN_BENCH_QUANT=int8|w8a8|mixed|int4|w4a8|none (w8a8 = + per-row
activation int8 on the s8 MXU; mixed = w8a8 + int4 down projection;
int4/w4a8 = group-wise 4-bit weights, dq / s8 MXU),
HYDRAGEN_BENCH_KV=int8 (default; "" for bf16 KV),
HYDRAGEN_BENCH_SHARED_KV=follow|none|int8 (shared-level KV precision;
"none" keeps the once-stored prefix in bf16 — faster at long prefixes).
"""

from __future__ import annotations

import json
import os

import jax

# Persistent compilation cache: bench configs recompile identically between
# runs; caching them cuts repeat wall-clock from minutes to seconds.
from hydragen_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # TPU only: foreign-host CPU AOT entries can SIGILL

import numpy as np

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import PRESETS, ModelConfig
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.utils.capacity import HBM_BYTES, param_bytes
from hydragen_tpu.utils.timing import timed


def cache_bytes(cfg: ModelConfig, bs: int, unique_len: int, shared_len: int,
                kv_quant, shared_int8: bool | None = None) -> int:
    """kv_quant: None/"int8"/"int4" unique-cache precision. shared_int8:
    shared-level precision (None = follow kv_quant's quantized-ness) — the
    HYDRAGEN_BENCH_SHARED_KV mixed-precision knob must be priced here or the
    HBM-fit assert passes for configs that OOM at setup_caches."""
    if shared_int8 is None:
        shared_int8 = kv_quant is not None
    per_tok = cfg.num_key_value_heads * cfg.head_dim * 2  # k + v
    L = cfg.num_hidden_layers

    def bytes_for(tokens, quant):
        payload = L * tokens * per_tok
        if quant == "int4":  # two tokens per byte + f32 per-(token, head)
            return payload // 2 + L * tokens * cfg.num_key_value_heads * 2 * 4
        if quant:
            return payload + L * tokens * cfg.num_key_value_heads * 2 * 4
        return payload * 2

    return (bytes_for(bs * unique_len, kv_quant)
            + bytes_for(shared_len, "int8" if shared_int8 else None))


def run_config(engine, prompt, bs, new_tokens, disable_hydragen, iters=3,
               kv_quant=None, shared_kv_quant="follow"):
    shared_len = prompt.shape[1]
    # Decode writes slots [0, new_tokens-1); no unique suffix in this
    # protocol, so new_tokens slots exactly suffice (HBM is the binding
    # constraint at the 7B/bs256 north star).
    unique_len = new_tokens
    if disable_hydragen:
        unique_len += shared_len + 8
    engine.setup_caches(
        max_unique_batch_size=bs,
        max_unique_seq_length=unique_len,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[shared_len],
        kv_quant=kv_quant,
        shared_kv_quant=shared_kv_quant,
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
    engine.cache = None  # free before the next allocation
    return bs * new_tokens / min(times)


def main():
    model = os.environ.get("HYDRAGEN_BENCH_MODEL", "llama-2-7b")
    bs = int(os.environ.get("HYDRAGEN_BENCH_BS", "256"))
    shared_len = int(os.environ.get("HYDRAGEN_BENCH_SHARED", "2048"))
    # 64 new tokens: the reference protocol's arm is 128/256
    # (docs/sweeps_from_paper.md:27-49), but at bs 256 the 7B unique int8 KV
    # for 128 slots alone is ~8.9 GB vs the ~8.3 GB left beside int8
    # weights on a 16 GB v5e — the protocol point does not fit at the
    # tracked batch. The headline keeps the round-over-round comparable
    # (bs 256, 2K, 64-new) config; the 7B synth sweep covers the 128-new
    # protocol arm at feasible batches.
    new_tokens = int(os.environ.get("HYDRAGEN_BENCH_NEW", "64"))

    # North-star config (BASELINE.md): INT8 weights + INT8 KV. Default
    # matmul mode is "w8a8" since round 4: same int8 weight storage, plus
    # per-row dynamic activation int8 feeding the native s8 MXU — since
    # round 5 on ALL projection families (the shared per-activation
    # quantize flipped them; models/llama.py qmm routing); the ce-delta
    # quality gate passes at 0.00044 nats (results/r5_measure/
    # quality_final.log; the r3 outlier-injected gate passed at 0.0033 vs
    # a 0.015 threshold). "int8" gives the weight-only path.
    quant = os.environ.get("HYDRAGEN_BENCH_QUANT", "w8a8")
    quant = None if quant in ("", "none") else quant
    kv_quant = os.environ.get("HYDRAGEN_BENCH_KV", "int8") or None
    shared_kv = os.environ.get("HYDRAGEN_BENCH_SHARED_KV", "follow")

    cfg = PRESETS[model]
    # Random weights, quantized at init: timing is weight-value independent
    # and a 7B bf16 original would not fit beside its int8 copy in 16 GB.
    params = init_params(cfg, jax.random.PRNGKey(0), quantized=quant or False)
    engine = HydragenLlama(cfg, params, quantization=quant)

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, cfg.vocab_size, size=(1, shared_len)).astype(np.int32)

    budget = HBM_BYTES - param_bytes(cfg, quant)
    # "follow" + int4 stores the SHARED levels int8 (engine setup_caches) —
    # price them that way or the bs-halving loop over-halves.
    shared_int8 = {"follow": kv_quant is not None, "int8": True, "none": False}[shared_kv]
    # Safety net, not an abort: halve bs until the hydragen arm fits (and
    # say so in the metric name) rather than dying at the driver's hands.
    req_bs = bs
    while bs > 1 and cache_bytes(cfg, bs, new_tokens, shared_len,
                                 kv_quant, shared_int8) >= budget:
        bs //= 2
    tput = run_config(engine, prompt, bs, new_tokens, disable_hydragen=False,
                      kv_quant=kv_quant, shared_kv_quant=shared_kv)

    # No-sharing baseline: the prefix is copied into every row's cache, so
    # halve its batch until the copies fit (reference synth.py's noshared
    # mode OOMs the same way at paper scale). copy_shared_to_unique's
    # jnp.repeat materializes a transient copy of the per-row prefix KV in
    # the cache's storage dtype — budget it too, or the chosen base_bs can
    # still OOM at runtime (ADVICE r2).
    # int4's token-planar pack cannot host the baseline's copied prefix
    # (traced-offset nibble writes) — the baseline arm runs int8, the
    # nearest feasible precision (annotated below).
    base_kv = "int8" if kv_quant == "int4" else kv_quant

    def repeat_transient(b):
        per_tok = cfg.num_key_value_heads * cfg.head_dim * 2
        payload = cfg.num_hidden_layers * b * shared_len * per_tok
        if base_kv == "int8":
            return payload + payload // cfg.head_dim * 4  # + f32 scales
        return payload * 2

    base_bs = bs
    while base_bs > 1 and cache_bytes(
        cfg, base_bs, new_tokens + shared_len + 8, shared_len, base_kv,
        shared_int8,
    ) + repeat_transient(base_bs) > budget:
        base_bs //= 2
    # Same shared-KV precision as the hydragen arm: the two arms of the
    # headline ratio must run the identical configuration (modulo the int4
    # exception above).
    base = run_config(engine, prompt, base_bs, new_tokens, disable_hydragen=True,
                      kv_quant=base_kv, shared_kv_quant=shared_kv)

    tag = quant or "bf16"
    if kv_quant:
        tag += "+kv" + kv_quant
    # NB: when base_bs < bs the speedup compares hydragen at its batch
    # against the baseline at its own best *feasible* batch (the baseline
    # not fitting IS the paper's point) — it is a system-level ratio, not an
    # equal-batch kernel speedup; see docs/results_v5e.md for equal-batch
    # numbers where both fit.
    result = {
        "metric": "decode_throughput_%s_%s_bs%d_shared%d"
        % (model, tag, bs, shared_len),
        "value": round(tput, 1),
        "unit": "tok/s",
        "vs_baseline": round(tput / base, 3),
        "baseline_bs": base_bs,
    }
    if bs != req_bs:  # HBM safety net engaged (see the halving loop above)
        result["requested_bs"] = req_bs
    if kv_quant == "int4":
        result["baseline_kv"] = "int8"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
