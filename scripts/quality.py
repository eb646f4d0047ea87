"""Quantization quality gate: perplexity / KL of int8 vs bf16 at model scale.

BASELINE.md bound: "perplexity within 0.1 at equal bit-width". With no
checkpoints in the zero-egress environment the weights are random-init, so
absolute perplexity is near-uniform over the vocab; the *delta* between the
bf16 model and its int8-quantized copy still measures exactly the
quantization noise the bound constrains (reference protocol analogue:
tests/test_e2e.py:28-30's logit-parity gates).

Usage (TPU or CPU):
    python scripts/quality.py --preset sheared-llama-1.3b --tokens 512 --batch 4

Prints mean cross-entropy (nats) under both precisions, the perplexity
delta, and the mean KL(bf16 || int8) per token.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def eval_logits(engine, ids):
    """Full next-token logits [b, T, V] for a token batch."""
    engine.setup_caches(
        max_unique_batch_size=ids.shape[0],
        max_unique_seq_length=16,
        max_shared_batch_sizes=[ids.shape[0]],
        max_shared_seq_lengths=[ids.shape[1]],
    )
    logits = engine.append_shared(ids, full_logits=True)
    engine.empty_shared_cache()
    return logits


def quality_metrics(logits_hi, logits_lo, ids):
    """(ce_hi, ce_lo, mean_kl) — cross-entropies in nats and KL(hi || lo)."""
    tgt = ids[:, 1:]
    lp_hi = jax.nn.log_softmax(logits_hi[:, :-1].astype(jnp.float32), axis=-1)
    lp_lo = jax.nn.log_softmax(logits_lo[:, :-1].astype(jnp.float32), axis=-1)
    ce = lambda lp: -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()
    p_hi = jnp.exp(lp_hi)
    kl = jnp.sum(p_hi * (lp_hi - lp_lo), axis=-1).mean()
    return float(ce(lp_hi)), float(ce(lp_lo)), float(kl)


def run(preset: str, tokens: int, batch: int, seed: int = 0):
    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.config import PRESETS
    from hydragen_tpu.models.llama import init_params
    from hydragen_tpu.ops.quant import quantize_params

    cfg = PRESETS[preset] if isinstance(preset, str) else preset
    params = init_params(cfg, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, tokens)), jnp.int32
    )

    hi = HydragenLlama(cfg, params)
    logits_hi = eval_logits(hi, ids)
    lo = HydragenLlama(cfg, quantize_params(params), quantization="int8")
    logits_lo = eval_logits(lo, ids)

    ce_hi, ce_lo, kl = quality_metrics(logits_hi, logits_lo, ids)
    return {
        "preset": preset if isinstance(preset, str) else "custom",
        "tokens": tokens * batch,
        "ce_bf16_nats": round(ce_hi, 5),
        "ce_int8_nats": round(ce_lo, 5),
        "ppl_bf16": round(float(np.exp(ce_hi)), 4),
        "ppl_int8": round(float(np.exp(ce_lo)), 4),
        "ppl_delta": round(float(abs(np.exp(ce_lo) - np.exp(ce_hi))), 4),
        # Scale-free form of the BASELINE "perplexity within 0.1" bound:
        # 0.1 ppl at a real model's ppl ~7 is a cross-entropy delta of
        # ~0.014 nats; a random-init model's ppl sits near |vocab| where an
        # absolute 0.1 is meaninglessly strict/loose depending on vocab.
        "ce_delta_nats": round(abs(ce_lo - ce_hi), 6),
        "mean_kl_nats": round(kl, 6),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sheared-llama-1.3b")
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    print(json.dumps(run(args.preset, args.tokens, args.batch, args.seed)))


if __name__ == "__main__":
    main()
