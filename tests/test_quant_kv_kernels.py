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
