"""W8A8 Pallas GEMM parity vs its f32 oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.gemm import (
    quantize_rows,
    w8a8_matmul,
    w8a8_reference,
)


@pytest.mark.parametrize(
    "m,k,n,bm,bn,bk",
    [
        (8, 256, 256, None, 128, 128),
        (12, 256, 384, 8, 128, 256),    # M padding + multi-k-block
        (256, 512, 512, 128, 256, 256),  # multi-block every axis
    ],
)
def test_w8a8_matmul_parity(m, k, n, bm, bn, bk):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32)

    a_q, a_s = quantize_rows(a)
    w_q, w_s = quantize_rows(w)  # per-out-channel == per-row of [N, K]
    w_s = w_s[:, 0]

    out = w8a8_matmul(a_q, a_s, w_q, w_s, block_m=bm, block_n=bn, block_k=bk,
                      out_dtype=jnp.float32, interpret=True)
    ref = w8a8_reference(a_q, a_s, w_q, w_s, out_dtype=jnp.float32)
    # Same int8 operands -> only f32-accumulation noise differs from the
    # i32-exact kernel path; the kernel is the more exact one.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 128), jnp.bfloat16)
    q, s = quantize_rows(x)
    back = q.astype(jnp.float32) * s
    err = np.abs(np.asarray(back - x.astype(jnp.float32))).max()
    amax = np.abs(np.asarray(x, np.float32)).max()
    assert err <= amax / 127.0 + 1e-6


def test_w8a8_engine_e2e(monkeypatch):
    """Engine quantization="w8a8" routes layer matmuls through the Pallas
    s8 GEMM (interpret mode on CPU via HYDRAGEN_W8A8_INTERPRET) and still
    greedy-decodes in agreement with the weight-only int8 engine."""
    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 6)).astype(np.int32)

    def run(quantization):
        eng = HydragenLlama(cfg, params, quantization=quantization)
        eng.setup_caches(4, 16, [1], [8])
        return np.asarray(eng.generate(
            input_ids=[prompt], num_return_sequences=4, max_new_tokens=5,
            temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
        ))

    out_dq = run("int8")
    out_w8a8 = run("w8a8")
    agree = (out_dq == out_w8a8).mean()
    assert agree >= 0.8, f"w8a8 tokens diverged from weight-only int8: {agree}"
