"""hydragen_attention vs a brute-force concatenated-KV oracle.

Mirrors the reference's op-level tier (/root/reference/tests/test_attention.py):
for every sequence, manually concatenate its slice of each shared level plus
its unique KV into one tensor and run plain attention on it. Covers 1-3
hierarchy levels, ragged (padded) levels, ragged unique lengths, MHA and GQA.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydragen_tpu.ops.hydragen import hydragen_attention
from hydragen_tpu.ops.reference import attention_with_lse


def rdiff(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return (2 * np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-12)).mean()


def dense_attention_np(q, k, v, causal=False):
    """Plain numpy attention oracle. q [nq,hq,d]; k/v [s,hkv,d]."""
    nq, hq, d = q.shape
    s, hkv, _ = k.shape
    group = hq // hkv
    kr = np.repeat(k, group, axis=1)  # [s, hq, d]
    vr = np.repeat(v, group, axis=1)
    scores = np.einsum("qhd,shd->hqs", q, kr) / math.sqrt(d)
    if causal:
        mask = np.arange(s)[None, :] <= (np.arange(nq)[:, None] + (s - nq))
        scores = np.where(mask[None], scores, -np.inf)
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    w = p / p.sum(-1, keepdims=True)
    return np.einsum("hqs,shd->qhd", w, vr)


def oracle(q, uk, uv, shared_ks, shared_vs, shared_lens, seq_lens, causal_unique):
    """Per-sequence concat of (shared level slices + unique) then dense attn."""
    q, uk, uv = map(np.asarray, (q, uk, uv))
    b, nq = q.shape[:2]
    outs = []
    for i in range(b):
        kv_ks, kv_vs = [], []
        for sk, sv, slens in zip(shared_ks, shared_vs, shared_lens):
            sk, sv = np.asarray(sk), np.asarray(sv)
            sb = sk.shape[0]
            j = i // (b // sb)
            L = int(slens[j]) if slens is not None else sk.shape[1]
            kv_ks.append(sk[j, :L])
            kv_vs.append(sv[j, :L])
        if uk.shape[1] > 0:
            ul = int(seq_lens[i]) if seq_lens is not None else uk.shape[1]
            kv_ks.append(uk[i, :ul])
            kv_vs.append(uv[i, :ul])
        k_cat = np.concatenate(kv_ks, 0)
        v_cat = np.concatenate(kv_vs, 0)
        outs.append(dense_attention_np(q[i], k_cat, v_cat, causal=causal_unique))
    return np.stack(outs)


def make_case(key, b, nq, hq, hkv, d, ulen, levels, ragged_levels=False,
              ragged_unique=False):
    ks = jax.random.split(key, 4 + 3 * len(levels))
    q = jax.random.normal(ks[0], (b, nq, hq, d))
    uk = jax.random.normal(ks[1], (b, ulen, hkv, d))
    uv = jax.random.normal(ks[2], (b, ulen, hkv, d))
    shared_ks, shared_vs, shared_lens = [], [], []
    for li, (sb, slen) in enumerate(levels):
        sk = jax.random.normal(ks[3 + 3 * li], (sb, slen, hkv, d))
        sv = jax.random.normal(ks[4 + 3 * li], (sb, slen, hkv, d))
        if ragged_levels:
            lens = jax.random.randint(ks[5 + 3 * li], (sb,), 1, slen + 1)
        else:
            lens = None
        shared_ks.append(sk)
        shared_vs.append(sv)
        shared_lens.append(lens)
    if ragged_unique:
        seq_lens = jax.random.randint(ks[3], (b,), 1, ulen + 1)
    else:
        seq_lens = None
    return q, uk, uv, shared_ks, shared_vs, shared_lens, seq_lens


CASES = [
    # (b, nq, hq, hkv, d, ulen, levels, ragged_levels, ragged_unique)
    (4, 1, 8, 8, 32, 6, [(1, 12)], False, True),       # decode, 1 level, MHA
    (4, 1, 8, 2, 32, 6, [(1, 12)], False, True),       # decode, GQA
    (8, 1, 8, 2, 64, 5, [(1, 16), (4, 8)], False, True),   # 2-level decode
    (8, 1, 4, 1, 32, 5, [(1, 16), (2, 8), (4, 4)], False, True),  # 3-level
    (4, 5, 8, 2, 32, 5, [(1, 12)], False, None),       # unique prefill (causal)
    (8, 3, 8, 4, 32, 4, [(2, 10), (4, 6)], False, None),
    (6, 1, 6, 2, 32, 4, [(3, 9)], True, True),         # ragged shared level
    (8, 2, 8, 2, 32, 6, [(2, 11), (4, 7)], True, None),  # ragged + causal
    (4, 1, 8, 2, 32, 0, [(2, 9)], True, True),         # empty unique, ragged
    (4, 1, 8, 8, 32, 0, [(1, 8)], False, None),        # early-exit path
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_hydragen_vs_oracle(case):
    b, nq, hq, hkv, d, ulen, levels, ragged_l, ragged_u = case
    q, uk, uv, sks, svs, slens, seq_lens = make_case(
        jax.random.PRNGKey(__import__("zlib").crc32(str(case).encode()) % 2**31), b, nq, hq, hkv, d, ulen,
        levels, ragged_l, bool(ragged_u),
    )
    causal_unique = seq_lens is None

    got = hydragen_attention(q, uk, uv, sks, svs, slens, seq_lens, impl="xla")
    want = oracle(q, uk, uv, sks, svs, slens, seq_lens, causal_unique)

    assert got.shape == q.shape
    assert rdiff(got, want) < 1e-5, f"rdiff={rdiff(got, want)}"
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_reference_attention_vs_numpy():
    """attention_with_lse itself vs a plain numpy softmax (incl. lse value)."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    b, nq, hq, hkv, d, s = 3, 4, 6, 2, 16, 9
    q = jax.random.normal(kq, (b, nq, hq, d))
    k = jax.random.normal(kk, (b, s, hkv, d))
    v = jax.random.normal(kv, (b, s, hkv, d))

    out, lse = attention_with_lse(q, k, v, causal=True)
    for i in range(b):
        want = dense_attention_np(np.asarray(q[i]), np.asarray(k[i]), np.asarray(v[i]), causal=True)
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=1e-4)

    # lse: log sum exp of scaled scores over allowed positions.
    i, qi, h = 1, 2, 3
    kr = np.repeat(np.asarray(k[i]), hq // hkv, axis=1)
    scores = (np.asarray(q[i, qi, h]) @ kr[:, h].T) / math.sqrt(d)
    scores = scores[: (s - nq) + qi + 1]
    want_lse = np.log(np.exp(scores - scores.max()).sum()) + scores.max()
    np.testing.assert_allclose(np.asarray(lse[i, qi, h]), want_lse, rtol=1e-5)


def test_long_prefix_16k():
    """Smoke the 16K-token shared prefix case the reference tests (scaled-down
    heads); checks numerical stability at long context."""
    key = jax.random.PRNGKey(11)
    kq, kk, kv, ku1, ku2 = jax.random.split(key, 5)
    b, nq, hq, hkv, d, slen, ulen = 2, 1, 2, 1, 64, 16384, 4
    q = jax.random.normal(kq, (b, nq, hq, d), dtype=jnp.float32)
    sk = jax.random.normal(kk, (1, slen, hkv, d))
    sv = jax.random.normal(kv, (1, slen, hkv, d))
    uk = jax.random.normal(ku1, (b, ulen, hkv, d))
    uv = jax.random.normal(ku2, (b, ulen, hkv, d))
    seq_lens = jnp.array([2, 4])

    got = hydragen_attention(q, uk, uv, [sk], [sv], [None], seq_lens, impl="xla")
    want = oracle(q, uk, uv, [sk], [sv], [None], seq_lens, False)
    assert rdiff(got, want) < 1e-4
