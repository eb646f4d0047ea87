"""Quantization quality gate: perplexity / KL of int8 vs bf16 at model scale.

BASELINE.md bound: "perplexity within 0.1 at equal bit-width". With no
checkpoints in the zero-egress environment the weights are random-init, so
absolute perplexity is near-uniform over the vocab; the *delta* between the
bf16 model and its int8-quantized copy still measures exactly the
quantization noise the bound constrains (reference protocol analogue:
tests/test_e2e.py:28-30's logit-parity gates). NB: at this near-uniform
operating point the ``ppl_delta`` field understates error on real peaked
checkpoints — the scale-free ``ce_delta_nats``/``mean_kl_nats`` are the
gate; do not cite ``ppl_delta`` as evidence for the 0.1-ppl bound
(ADVICE r2). Re-run with real weights when a checkpoint is available.

``--outliers`` makes the gate adversarial (VERDICT r2 item 7): a random
0.1 % of output channels in every projection are scaled 20x, mimicking the
heavy-tailed channel kurtosis of real LLM weights — exactly the regime
where naive per-tensor int8 collapses. ``--scheme per_tensor`` runs that
naive baseline; the gate must FAIL there and PASS under the shipped
per-channel scheme (tests/test_quality.py asserts both).

Usage (TPU or CPU):
    python scripts/quality.py --preset sheared-llama-1.3b --tokens 512 \
        --batch 4 --outliers

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


def inject_outlier_channels(params, seed: int = 0, frac: float = 0.001,
                            mult: float = 20.0):
    """Scale a random ``frac`` of output channels of every projection by
    ``mult`` — synthetic heavy-tailed channel kurtosis. Gaussian random
    weights have no outlier channels, which is precisely what makes real
    LLM int8 quantization hard; this restores the failure mode so the gate
    can actually discriminate schemes."""
    rng = np.random.RandomState(seed + 1234)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
        w = np.array(layers[name])  # [L, in, out] float
        n_out = w.shape[-1]
        idx = rng.choice(n_out, size=max(1, int(n_out * frac)), replace=False)
        w[..., idx] *= mult
        layers[name] = jnp.asarray(w, dtype=layers[name].dtype)
    out = dict(params)
    out["layers"] = layers
    return out


def quantize_params_per_tensor(params):
    """Naive baseline: ONE int8 scale per matrix (per layer) — the scheme
    the adversarial gate must fail. The shipped scheme is per-output-channel
    (ops/quant.py quantize)."""
    from hydragen_tpu.ops.quant import QuantizedTensor

    def qt(w):
        wf = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=(-2, -1), keepdims=True)
        scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
        q = jnp.clip(
            jnp.round(wf / scale.astype(jnp.float32)), -127, 127
        ).astype(jnp.int8)
        out_ch = jnp.broadcast_to(
            jnp.squeeze(scale, (-2, -1))[..., None], wf.shape[:-2] + wf.shape[-1:]
        )
        return QuantizedTensor(q=jnp.swapaxes(q, -1, -2), scale=out_ch)

    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
        layers[name] = qt(layers[name])
    out["layers"] = layers
    out["lm_head"] = qt(params["lm_head"])
    return out


def run(preset: str, tokens: int, batch: int, seed: int = 0,
        outliers: bool = False, scheme: str = "per_channel",
        quantization: str = "int8"):
    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.config import PRESETS
    from hydragen_tpu.models.llama import init_params
    from hydragen_tpu.ops.quant import quantize_params

    cfg = PRESETS[preset] if isinstance(preset, str) else preset
    params = init_params(cfg, jax.random.PRNGKey(seed))
    if outliers:
        params = inject_outlier_channels(params, seed)
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, tokens)), jnp.int32
    )

    hi = HydragenLlama(cfg, params)
    logits_hi = eval_logits(hi, ids)
    if quantization in ("int4", "w4a8"):
        # INT4 is group-wise by construction (ops/quant.py quantize4); the
        # per-tensor adversarial baseline is an int8-only experiment.
        assert scheme == "per_channel", "int4 gate runs the shipped scheme only"
        quantizer = lambda p: quantize_params(p, bits=4)  # noqa: E731
    else:
        quantizer = (
            quantize_params if scheme == "per_channel"
            else quantize_params_per_tensor
        )
    # "w8a8" additionally quantizes activations per row at runtime
    # (ops/gemm.py); the same gate bounds its extra noise. On a non-TPU
    # backend the w8a8 path needs interpret-mode pallas (ops/quant.py falls
    # back to weight-only dq otherwise, which would make this gate vacuous)
    # -- force it rather than silently measuring the wrong thing.
    if quantization in ("w8a8", "w4a8") and jax.default_backend() != "tpu":
        import os

        os.environ["HYDRAGEN_W8A8_INTERPRET"] = "1"
    if quantization == "w8a8":
        # The engine's default routes only the measured-faster families
        # (gate/up) through the s8 GEMM (models/llama.py qmm); the gate
        # bounds the WORST case — every eligible family quantized — which
        # is a superset of any deployed family mix's noise.
        import os

        os.environ["HYDRAGEN_W8A8_FAMILIES"] = "all"
    lo = HydragenLlama(cfg, quantizer(params), quantization=quantization)
    logits_lo = eval_logits(lo, ids)

    ce_hi, ce_lo, kl = quality_metrics(logits_hi, logits_lo, ids)
    extra = {}
    if quantization in ("w8a8", "w4a8"):
        # Which projection families actually run the s8 kernel at this
        # preset's dims? Ineligible ones fall back to the weight-only dq
        # path (ops/quant.py qmatmul), whose activation noise is ZERO —
        # silently excluding a family would make the gate measure less
        # than deployment does (e.g. 1.3B's down proj: K=5504 forces
        # group 64, below the kernel's 128-lane group tile; at the 7B
        # target every family is eligible).
        from hydragen_tpu.ops.quant import _w4a8_blocks, _w8a8_blocks

        cov = {}
        for fam in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
            t = lo.params["layers"][fam]
            if quantization == "w4a8":
                N, Kp = t.qp.shape[-2], t.qp.shape[-1]
                cov[fam] = _w4a8_blocks(N, 2 * Kp, t.group_size) is not None
            else:
                N, K = t.q.shape[-2], t.q.shape[-1]
                cov[fam] = _w8a8_blocks(N, K) is not None
        extra["s8_kernel_coverage"] = cov
        missing = sorted(f for f, ok in cov.items() if not ok)
        if missing:
            print(f"WARNING: {quantization} kernel ineligible for "
                  f"{missing} at these dims — those families run the "
                  f"noise-free dq path; the gate under-measures them.")
    return {
        **extra,
        "preset": preset if isinstance(preset, str) else "custom",
        "scheme": scheme,
        "quantization": quantization,
        "outliers": outliers,
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


def run_kv(preset: str, tokens: int, batch: int, seed: int = 0,
           kv_quant: str = "int8", outliers: bool = False):
    """KV-cache precision gate: fp32/bf16 WEIGHTS throughout (isolates the
    cache), logits collected along a FORCED token stream whose decode steps
    read the quantized shared level + growing quantized unique cache (the
    weight gate's one-pass prefill never reads the cache at all). Compares
    against the identical run with full-precision KV."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import PRESETS
    from hydragen_tpu.models.llama import init_params

    cfg = PRESETS[preset] if isinstance(preset, str) else preset
    params = init_params(cfg, jax.random.PRNGKey(seed))
    if outliers:
        # Outlier WEIGHT channels produce outlier K/V activation values —
        # exactly the heavy tails that stress a per-(token, head) int4 grid.
        params = inject_outlier_channels(params, seed)
    rng = np.random.RandomState(seed)
    half = tokens // 2
    steps = min(tokens - half - 1, 64)
    prefix = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, half)), jnp.int32
    )
    first = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, 1)), jnp.int32
    )
    overrides = jnp.asarray(
        rng.randint(1, cfg.vocab_size, size=(batch, steps)), jnp.int32
    )

    def logits_for(kvq):
        eng = HydragenLlama(cfg, params)
        eng.setup_caches(
            max_unique_batch_size=batch,
            max_unique_seq_length=steps + 8,
            max_shared_batch_sizes=[batch],
            max_shared_seq_lengths=[half],
            kv_quant=kvq,
        )
        _, logits = eng.generate(
            input_ids=[prefix, first], num_return_sequences=1,
            max_new_tokens=steps, temperature=0.0, return_logits=True,
            token_overrides=overrides, shared_cache_op=SharedCacheOp.WIPE,
        )
        eng.cache = None
        return jnp.stack(logits, axis=1)  # [b, steps, V]

    logits_hi = logits_for(None)
    logits_lo = logits_for(kv_quant)
    # Targets: the forced stream itself (shifted one step).
    ids = jnp.concatenate([first, overrides], axis=1)[:, : steps + 1]
    ce_hi, ce_lo, kl = quality_metrics(logits_hi, logits_lo, ids[:, 1:])
    return {
        "preset": preset if isinstance(preset, str) else "custom",
        "kv_quant": kv_quant,
        "outliers": outliers,
        "tokens": int(batch * steps),
        "ce_bf16_nats": round(ce_hi, 5),
        "ce_kvq_nats": round(ce_lo, 5),
        "ce_delta_nats": round(abs(ce_lo - ce_hi), 6),
        "mean_kl_nats": round(kl, 6),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sheared-llama-1.3b")
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outliers", action="store_true",
                    help="inject 20x outlier channels (adversarial gate)")
    ap.add_argument("--scheme", default="per_channel",
                    choices=["per_channel", "per_tensor"])
    ap.add_argument("--quantization", default="int8",
                    choices=["int8", "w8a8", "int4", "w4a8"],
                    help="w8a8 = weight int8 + per-row dynamic activation "
                    "int8 (native s8 MXU matmuls); int4 = group-wise "
                    "4-bit weights (bf16 MXU); w4a8 = int4 weights on "
                    "the s8 MXU path")
    ap.add_argument("--kv-quant", default=None, choices=[None, "int8", "int4"],
                    help="gate the KV-CACHE precision instead of weights: "
                    "fp weights, logits along a forced decode stream that "
                    "reads the quantized caches")
    args = ap.parse_args()
    if args.kv_quant is not None:
        print(json.dumps(run_kv(args.preset, args.tokens, args.batch,
                                args.seed, kv_quant=args.kv_quant,
                                outliers=args.outliers)))
    else:
        print(json.dumps(run(args.preset, args.tokens, args.batch, args.seed,
                             outliers=args.outliers, scheme=args.scheme,
                             quantization=args.quantization)))


if __name__ == "__main__":
    main()
