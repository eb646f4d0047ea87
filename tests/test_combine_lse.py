"""combine_lse correctness — mirrors the reference's kernel unit tier
(/root/reference/tests/test_combine_lse.py): merge of random partials against
a directly-computed full softmax, sweeping odd head dims to hit masking edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydragen_tpu.ops.combine import combine_lse, combine_lse_with_stats
from hydragen_tpu.ops.reference import attention_with_lse


def rdiff(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return (2 * np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-12)).mean()


@pytest.mark.parametrize("bs,seq,heads", [(1, 4, 2), (3, 7, 5), (8, 16, 4)])
@pytest.mark.parametrize("hdim", [63, 64, 128, 129])
@pytest.mark.parametrize("n_partials", [2, 3, 4])
def test_combine_matches_dense(bs, seq, heads, hdim, n_partials):
    """Splitting one softmax into chunks and re-merging must be exact."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # Build partials that genuinely come from one softmax: random scores
    # split along the kv axis.
    total_kv = 40
    scores = jax.random.normal(k1, (bs, seq, heads, total_kv)) * 3.0
    values = jax.random.normal(k2, (bs, total_kv, heads, hdim))

    # Dense answer.
    w = jax.nn.softmax(scores, axis=-1)
    dense = jnp.einsum("bqhk,bkhd->bqhd", w, values)

    # Chunked partials.
    bounds = np.linspace(0, total_kv, n_partials + 1).astype(int)
    outs, lses = [], []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sc = scores[..., lo:hi]
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bqhk,bkhd->bqhd", p / l, values[:, lo:hi])
        outs.append(o)
        lses.append(m[..., 0] + jnp.log(l[..., 0]))

    merged = combine_lse(outs, lses)
    assert rdiff(merged, dense) < 1e-5

    merged2, new_lse = combine_lse_with_stats(outs, lses)
    full_lse = jax.nn.logsumexp(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(new_lse), np.asarray(full_lse), rtol=1e-5, atol=1e-5)


def test_combine_with_fully_masked_partial():
    """A partial with lse=-inf (empty KV) must contribute nothing, no NaNs."""
    key = jax.random.PRNGKey(1)
    out = jax.random.normal(key, (2, 3, 4, 8))
    lse = jax.random.normal(key, (2, 3, 4))
    empty_out = jnp.zeros_like(out)
    empty_lse = jnp.full(lse.shape, -jnp.inf)

    merged = combine_lse([out, empty_out], [lse, empty_lse])
    assert not np.any(np.isnan(np.asarray(merged)))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(out), rtol=1e-6)


def test_combine_consistent_with_attention_split():
    """attention(concat kv) == combine(attention(kv1), attention(kv2))."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    b, nq, hq, hkv, d, s1, s2 = 2, 3, 8, 2, 16, 10, 14
    q = jax.random.normal(kq, (b, nq, hq, d))
    k = jax.random.normal(kk, (b, s1 + s2, hkv, d))
    v = jax.random.normal(kv, (b, s1 + s2, hkv, d))

    full, _ = attention_with_lse(q, k, v)
    o1, l1 = attention_with_lse(q, k[:, :s1], v[:, :s1])
    o2, l2 = attention_with_lse(q, k[:, s1:], v[:, s1:])
    merged = combine_lse([o1, o2], [l1, l2])
    assert rdiff(merged, full) < 1e-5
