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
