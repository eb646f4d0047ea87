"""int8-KV dequant fused into the Pallas kernels vs the dequantize-first
XLA oracle (reference pattern: xformers_stuff.py:431-530, in-kernel dequant).

The kernels must match attention over host-dequantized bf16/f32 KV to fp32
rounding: the scale commutes out of both matmuls exactly (int8 payloads are
exact in bf16)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.combine import combine_lse
from hydragen_tpu.ops.flash import flash_attention_bhsd
from hydragen_tpu.ops.fused import fused_hydragen_decode_bhsd
from hydragen_tpu.ops.quant import dequantize_kv, quantize_kv
from hydragen_tpu.ops.reference import attention_bhsd


def quantized_kv(rng, *shape):
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    q, s = quantize_kv(x)
    return q, s, dequantize_kv(q, s, jnp.float32)


GENERIC_CASES = [
    # b, hq, hkv, m, s, ragged  (m >= 256/huge not needed: impl is forced)
    (2, 4, 2, 64, 300, False),
    (2, 4, 2, 64, 300, True),
    (1, 8, 1, 128, 513, True),   # MQA, non-multiple kv length
]


@pytest.mark.parametrize("b,hq,hkv,m,s,ragged", GENERIC_CASES)
def test_generic_kernel_int8_kv(b, hq, hkv, m, s, ragged):
    rng = np.random.RandomState(0)
    d = 64
    q = jnp.asarray(rng.randn(b, hq, m, d), jnp.float32)
    kq, ks, kd = quantized_kv(rng, b, hkv, s, d)
    vq, vs, vd = quantized_kv(rng, b, hkv, s, d)
    lens = jnp.asarray(rng.randint(1, s + 1, b), jnp.int32) if ragged else None

    got, got_lse = flash_attention_bhsd(
        q, kq, vq, causal=False, kv_seq_lens=lens, k_scale=ks, v_scale=vs,
        block_m=32, block_k=128, interpret=True,
    )
    want, want_lse = attention_bhsd(q, kd, vd, causal=False, kv_seq_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), atol=2e-5)


def test_decode_kernel_int8_kv():
    rng = np.random.RandomState(1)
    b, hq, hkv, s, d = 8, 8, 2, 300, 64
    q = jnp.asarray(rng.randn(b, hq, 1, d), jnp.float32)
    kq, ks, kd = quantized_kv(rng, b, hkv, s, d)
    vq, vs, vd = quantized_kv(rng, b, hkv, s, d)
    lens = jnp.asarray(rng.randint(1, s + 1, b), jnp.int32)

    # M = 4 <= 32 routes to the row-batched decode kernel.
    got, got_lse = flash_attention_bhsd(
        q, kq, vq, causal=False, kv_seq_lens=lens, k_scale=ks, v_scale=vs,
        block_k=128, interpret=True,
    )
    want, want_lse = attention_bhsd(q, kd, vd, causal=False, kv_seq_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), atol=2e-5)


@pytest.mark.parametrize("b,sb,hq,hkv,S,U,ragged", [
    (8, 1, 4, 4, 96, 48, False),
    (8, 2, 4, 2, 200, 40, True),
    (16, 4, 8, 1, 64, 160, True),
])
def test_fused_kernel_int8_kv(b, sb, hq, hkv, S, U, ragged):
    rng = np.random.RandomState(2)
    d = 64
    sps = b // sb
    q = jnp.asarray(rng.randn(b, hq, 1, d), jnp.float32)
    skq, sks, skd = quantized_kv(rng, sb, hkv, S, d)
    svq, svs, svd = quantized_kv(rng, sb, hkv, S, d)
    ukq, uks, ukd = quantized_kv(rng, b, hkv, U, d)
    uvq, uvs, uvd = quantized_kv(rng, b, hkv, U, d)
    if ragged:
        slens = jnp.asarray(rng.randint(1, S + 1, sb), jnp.int32)
        ulens = jnp.asarray(rng.randint(1, U + 1, b), jnp.int32)
    else:
        slens = None
        ulens = jnp.full((b,), U, jnp.int32)

    got, got_lse = fused_hydragen_decode_bhsd(
        q, skq, svq, slens, ukq, uvq, ulens, interpret=True,
        shared_scales=(sks, svs), unique_scales=(uks, uvs),
    )

    # Decomposed oracle over dequantized KV.
    sk_b = jnp.repeat(skd, sps, axis=0)
    sv_b = jnp.repeat(svd, sps, axis=0)
    sl_b = None if slens is None else jnp.repeat(slens, sps)
    o1, l1 = attention_bhsd(q, sk_b, sv_b, causal=False, kv_seq_lens=sl_b)
    o2, l2 = attention_bhsd(q, ukd, uvd, causal=False, kv_seq_lens=ulens)
    want = combine_lse([o1, o2], [l1, l2])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_e2e_int8_kv_fused_decode_matches_xla():
    """End-to-end: impl='fused' with kv_quant='int8' (the newly-lifted gate)
    must produce the same tokens as the decomposed XLA path."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        dtype="float32",
    )  # head_dim 128: the fused kernel requires lane-aligned heads
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    prompt = rng.randint(1, 256, size=(1, 24)).astype(np.int32)

    def run(impl):
        eng = HydragenLlama(cfg, params, impl=impl, prefill_bucket=0)
        eng.setup_caches(
            max_unique_batch_size=4,
            max_unique_seq_length=32,
            max_shared_batch_sizes=[1],
            max_shared_seq_lengths=[24],
            kv_quant="int8",
        )
        return np.asarray(eng.generate(
            input_ids=[prompt], num_return_sequences=4, max_new_tokens=8,
            temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
        ))

    np.testing.assert_array_equal(run("fused"), run("xla"))
