"""Fused hydragen decode kernel vs the decomposed oracle path."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.combine import combine_lse
from hydragen_tpu.ops.fused import fused_hydragen_decode_bhsd
from hydragen_tpu.ops.reference import attention_bhsd


def oracle(q, sk, sv, slens, uk, uv, ulens):
    """Decomposed reference: per-source attention + exact LSE merge."""
    b = q.shape[0]
    sb = sk.shape[0]
    sps = b // sb
    outs, lses = [], []
    sk_b = jnp.repeat(sk, sps, axis=0)
    sv_b = jnp.repeat(sv, sps, axis=0)
    sl_b = None if slens is None else jnp.repeat(slens, sps)
    o, l = attention_bhsd(q, sk_b, sv_b, causal=False, kv_seq_lens=sl_b)
    outs.append(o); lses.append(l)
    o, l = attention_bhsd(q, uk, uv, causal=False, kv_seq_lens=ulens)
    outs.append(o); lses.append(l)
    return combine_lse(outs, lses)


CASES = [
    # b, sb, hq, hkv, S, U, ragged
    (8, 1, 4, 4, 96, 48, False),
    (8, 2, 4, 2, 200, 40, True),    # GQA + two prefixes + ragged lens
    (16, 4, 8, 1, 64, 160, True),   # MQA, many prefixes
    (4, 4, 2, 2, 128, 16, False),   # sps == 1
]


@pytest.mark.parametrize("b,sb,hq,hkv,S,U,ragged", CASES)
def test_fused_matches_decomposed(b, sb, hq, hkv, S, U, ragged):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    d = 64
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32)
    sk = jax.random.normal(ks[1], (sb, hkv, S, d), jnp.float32)
    sv = jax.random.normal(ks[2], (sb, hkv, S, d), jnp.float32)
    uk = jax.random.normal(ks[3], (b, hkv, U, d), jnp.float32)
    uv = jax.random.normal(ks[4], (b, hkv, U, d), jnp.float32)
    rng = np.random.RandomState(1)
    if ragged:
        slens = jnp.asarray(rng.randint(1, S + 1, sb), jnp.int32)
        ulens = jnp.asarray(rng.randint(1, U + 1, b), jnp.int32)
    else:
        slens = None
        ulens = jnp.full((b,), U, jnp.int32)

    got, got_lse = fused_hydragen_decode_bhsd(
        q, sk, sv, slens, uk, uv, ulens, interpret=True
    )
    want = oracle(q, sk, sv, slens, uk, uv, ulens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    # LSE must equal the merged LSE of the decomposed path.
    sps = b // sb
    from hydragen_tpu.ops.combine import combine_lse_with_stats

    sk_b = jnp.repeat(sk, sps, axis=0)
    sv_b = jnp.repeat(sv, sps, axis=0)
    sl_b = None if slens is None else jnp.repeat(slens, sps)
    oa, la = attention_bhsd(q, sk_b, sv_b, causal=False, kv_seq_lens=sl_b)
    ob, lb = attention_bhsd(q, uk, uv, causal=False, kv_seq_lens=ulens)
    _, want_lse = combine_lse_with_stats([oa, ob], [la, lb])
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), atol=1e-5, rtol=1e-5)
