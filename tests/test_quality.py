"""Quantization quality gate (BASELINE.md: perplexity within 0.1; logit KL).

CPU-scale version of scripts/quality.py — the per-token KL and perplexity
delta between a model and its int8-quantized copy must sit within the
BASELINE bound. scripts/quality.py runs the same gate at 1.3B on TPU."""

import numpy as np

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.models.config import ModelConfig

CFG = ModelConfig(
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=4,
    num_attention_heads=8,
    num_key_value_heads=4,
    dtype="float32",
)


def test_int8_quality_gate():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from quality import run

    m = run(CFG, tokens=128, batch=2)
    # BASELINE "perplexity within 0.1", scale-free: |delta ce| < 0.015 nats
    # (== 0.1 ppl at a real model's ppl ~7; see scripts/quality.py).
    assert m["ce_delta_nats"] < 0.015, m
    assert m["mean_kl_nats"] < 5e-3, m


def test_outlier_channels_discriminate_schemes():
    """Adversarial gate (VERDICT r2 item 7): with 20x outlier channels
    injected, the shipped per-channel int8 scheme must PASS the ce-delta
    gate and naive per-tensor int8 must FAIL it — i.e. the gate can
    actually reject a bad scheme, not just bless Gaussian weights."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from quality import run

    good = run(CFG, tokens=128, batch=2, outliers=True, scheme="per_channel")
    assert good["ce_delta_nats"] < 0.015, good
    assert good["mean_kl_nats"] < 5e-3, good

    bad = run(CFG, tokens=128, batch=2, outliers=True, scheme="per_tensor")
    assert bad["ce_delta_nats"] > 0.015 or bad["mean_kl_nats"] > 5e-3, (
        "per-tensor int8 survived outlier channels — the gate is too easy",
        bad,
    )


def test_int8_kv_quality_gate():
    """int8 KV cache: same gate, quantizing the cache instead of weights."""
    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.llama import init_params

    params = init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 512, size=(1, 32)).astype(np.int32)
    suffix = rng.randint(1, 512, size=(2, 8)).astype(np.int32)

    def logits_with(kv_quant):
        eng = HydragenLlama(CFG, params, prefill_bucket=0)
        eng.setup_caches(2, 32, [1], [32], kv_quant=kv_quant)
        eng.append_shared(prompt)
        _, logits = eng.generate(
            input_ids=[suffix], max_new_tokens=8, temperature=0.0,
            return_logits=True,
        )
        return jnp.stack(logits, axis=1).astype(jnp.float32)

    hi = logits_with(None)
    lo = logits_with("int8")
    lp_hi = jax.nn.log_softmax(hi, axis=-1)
    lp_lo = jax.nn.log_softmax(lo, axis=-1)
    kl = float(jnp.sum(jnp.exp(lp_hi) * (lp_hi - lp_lo), axis=-1).mean())
    assert kl < 5e-3, kl


def test_w8a8_quality_gate(monkeypatch):
    """W8A8 (weight int8 + per-row dynamic activation int8, native s8 MXU
    GEMM) must also clear the ce-delta gate: the activation quantization
    adds ~0.3-0.5 % RMS per matmul on top of the weight noise."""
    import sys
    from pathlib import Path

    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from quality import run

    m = run(CFG, tokens=64, batch=2, quantization="w8a8")
    assert m["ce_delta_nats"] < 0.015, m
    assert m["mean_kl_nats"] < 8e-3, m
