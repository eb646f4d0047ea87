"""Pallas flash kernel vs the pure-JAX oracle (interpret mode on CPU).

Covers the union of the reference kernels' duties (flash.py:163-350): plain
batched, causal prefill, GQA/MQA folding, per-row kv length masking (the
split-K decode case), zero-length rows, and non-tile-aligned shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.conftest  # noqa: F401

from hydragen_tpu.ops.flash import flash_attention_bhsd
from hydragen_tpu.ops.reference import attention_bhsd


# fp32 matmuls on real TPU run at the default (bf16-pass) MXU precision —
# both in the oracle einsums and in interpret-mode kernel dots — so the
# fp32-written tolerances must key on the backend (a HYDRAGEN_TEST_TPU=1
# run of this whole file must pass, so a .fail in the measurement plan
# means a real regression, not a precision artifact).
_TPU = jax.default_backend() == "tpu"


def _tol(atol: float) -> float:
    return max(atol, 2e-2) if _TPU else atol


def check(q, k, v, *, causal=False, kv_seq_lens=None, atol=2e-5, **kw):
    atol = _tol(atol)
    got_o, got_l = flash_attention_bhsd(
        q, k, v, causal=causal, kv_seq_lens=kv_seq_lens, interpret=True, **kw
    )
    want_o, want_l = attention_bhsd(q, k, v, causal=causal, kv_seq_lens=kv_seq_lens)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=atol)
    # lse: -inf rows must match exactly, finite rows closely.
    gl, wl = np.asarray(got_l), np.asarray(want_l)
    np.testing.assert_array_equal(np.isinf(gl), np.isinf(wl))
    fin = np.isfinite(wl)
    np.testing.assert_allclose(gl[fin], wl[fin], atol=atol, rtol=1e-2 if _TPU else 1e-5)


def rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


CASES = [
    # (b, hq, hkv, m, s, d, causal, ragged)
    (2, 4, 4, 1, 128, 64, False, False),      # decode MHA
    (2, 8, 2, 1, 128, 64, False, True),       # decode GQA + ragged lens
    (2, 8, 1, 1, 300, 64, False, True),       # MQA, non-128-divisible s
    (1, 4, 2, 16, 16, 64, True, False),       # causal prefill (s == m)
    (2, 4, 2, 40, 40, 32, True, False),       # causal, odd sizes
    (2, 2, 2, 7, 200, 128, False, True),      # tall kv, ragged
    (4, 8, 2, 1, 512, 128, False, True),      # realistic decode shape
    (1, 2, 1, 130, 130, 64, True, False),     # causal crossing block_m
    (2, 4, 2, 64, 200, 32, True, False),      # causal s > m (end-aligned)
    (2, 4, 2, 96, 40, 32, True, False),       # causal s < m (masked rows)
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_flash_vs_oracle(case):
    b, hq, hkv, m, s, d, causal, ragged = case
    key = jax.random.PRNGKey(sum(case[:6]))
    kq, kk, kv, kl = jax.random.split(key, 4)
    q = rand(kq, (b, hq, m, d))
    k = rand(kk, (b, hkv, s, d))
    v = rand(kv, (b, hkv, s, d))
    lens = jax.random.randint(kl, (b,), 1, s + 1) if ragged else None
    check(q, k, v, causal=causal, kv_seq_lens=lens)


def test_zero_length_rows():
    """kv_seq_lens == 0 rows must give out=0, lse=-inf (no NaN)."""
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = rand(kq, (3, 4, 1, 64))
    k = rand(kk, (3, 2, 128, 64))
    v = rand(kv, (3, 2, 128, 64))
    lens = jnp.array([0, 64, 0], dtype=jnp.int32)
    o, l = flash_attention_bhsd(q, k, v, kv_seq_lens=lens, interpret=True)
    o, l = np.asarray(o), np.asarray(l)
    assert not np.any(np.isnan(o))
    np.testing.assert_array_equal(o[0], 0.0)
    np.testing.assert_array_equal(o[2], 0.0)
    assert np.all(np.isinf(l[0])) and np.all(np.isinf(l[2]))
    assert np.all(np.isfinite(l[1]))


def test_bf16_inputs():
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = rand(kq, (2, 8, 4, 64), jnp.bfloat16)
    k = rand(kk, (2, 2, 256, 64), jnp.bfloat16)
    v = rand(kv, (2, 2, 256, 64), jnp.bfloat16)
    check(q, k, v, kv_seq_lens=jnp.array([100, 256]), atol=2e-2)


def test_block_sizes():
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = rand(kq, (1, 4, 64, 64))
    k = rand(kk, (1, 4, 384, 64))
    v = rand(kv, (1, 4, 384, 64))
    check(q, k, v, causal=False, block_m=32, block_k=128)
    check(q, k, v, causal=False, block_m=128, block_k=256)


def test_matches_combine_pipeline():
    """Kernel lse must interoperate with combine_lse across sources."""
    from hydragen_tpu.ops.combine import combine_lse

    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, m, d, s1, s2 = 2, 4, 1, 64, 128, 128
    q = rand(kq, (b, h, m, d))
    k = rand(kk, (b, h, s1 + s2, d))
    v = rand(kv, (b, h, s1 + s2, d))

    full, _ = attention_bhsd(q, k, v)
    o1, l1 = flash_attention_bhsd(q, k[:, :, :s1], v[:, :, :s1], interpret=True)
    o2, l2 = flash_attention_bhsd(q, k[:, :, s1:], v[:, :, s1:], interpret=True)
    merged = combine_lse([o1, o2], [l1, l2])
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full), atol=_tol(1e-5))
