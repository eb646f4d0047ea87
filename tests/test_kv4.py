"""INT4 (token-planar nibble-packed) unique KV cache.

The packing pairs token j with token j + S/2 in one byte row
(core/cache.py write paths) so the payload's TOKEN dim halves while
head_dim stays 128-lane exact — packing along head_dim would halve the
minor dim to 64 and XLA's (8, 128) HBM tiling would pad it straight back
(zero win). Readers split the score dot per nibble plane
(ops/reference.py attention_bhsd kv_bits=4).

Reference anchor: the int4 KV path the reference carries vestigially
(/root/reference/hydragen/xformers_stuff.py:431-530), here at full depth.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.core.cache import (
    allocate_cache,
    update_unique_decode,
    update_unique_prefill,
    write_decode_token_layer,
)
from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.ops.quant import quantize_kv4, unpack4


def _logical_unique_k(cache):
    """Unpack the packed unique-k buffer to logical [L, B, hkv, S, hd] f32."""
    k = cache.unique_k
    sc = cache.unique_k_scale
    if cache.unique_bshd:
        k = k.transpose(0, 1, 3, 2, 4)  # -> [L, B, hkv, Sp, hd]
        L, B = sc.shape[:2]
        hkv = k.shape[2]
        if cache.flat_scales:  # [L, B, S*hkv] token-major head-minor
            sc = sc.reshape(L, B, -1, hkv)
        sc = sc.transpose(0, 1, 3, 2)  # -> [L, B, hkv, S]
    lo, hi = unpack4(k)
    q = jnp.concatenate([lo, hi], axis=3)
    return np.asarray(q.astype(jnp.float32) * sc[..., None])


@pytest.mark.parametrize("bshd", [False, True])
def test_kv4_cache_write_roundtrip_across_planes(bshd):
    """Prefill crossing S/2, uniform decode writes in both planes, and the
    per-layer in-place write must all roundtrip within half an int4 step
    of each token's amax — including the read-modify-write that merges a
    high nibble over a live low-plane partner."""
    rng = np.random.RandomState(0)
    L, B, hkv, hd, S = 2, 3, 2, 8, 16  # Sp = 8
    cache = allocate_cache(L, B, S, [], [], hkv, hd, quantized=True,
                           unique_bits=4, unique_bshd=bshd)
    assert cache.max_unique_seq_len == S
    ref = rng.randn(L, B, hkv, S, hd).astype(np.float32)
    kv = jnp.asarray(ref)

    cache = update_unique_prefill(cache, kv[:, :, :, :11], kv[:, :, :, :11])
    for t in range(11, 14):
        pos = jnp.full((B,), t, jnp.int32)
        cache = update_unique_decode(
            cache, pos, kv[:, :, :, t:t + 1], kv[:, :, :, t:t + 1],
            uniform=True,
        )
    for t in range(14, 16):
        for li in range(L):
            cache = write_decode_token_layer(
                cache, li, kv[li, :, :, t:t + 1], kv[li, :, :, t:t + 1],
                jnp.int32(t),
            )

    got = _logical_unique_k(cache)
    err = np.abs(got - ref)
    bound = np.abs(ref).max(axis=-1, keepdims=True) / 7.0 * 0.51
    assert (err <= bound + 1e-5).all(), err.max()


@pytest.mark.parametrize("kv_bshd", [False, True])
def test_attention_bhsd_int4_matches_dequantized_oracle(kv_bshd):
    from hydragen_tpu.ops.quant import pack4
    from hydragen_tpu.ops.reference import attention_bhsd

    rng = np.random.RandomState(1)
    b, hq, hkv, m, s, d = 2, 4, 2, 3, 12, 8
    q = jnp.asarray(rng.randn(b, hq, m, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, hkv, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, hkv, s, d), jnp.float32)
    lens = jnp.asarray([9, 12], jnp.int32)

    kq, ksc = quantize_kv4(k)
    vq, vsc = quantize_kv4(v)
    # token-planar pack along the s axis
    pk = pack4(jnp.swapaxes(kq, 2, 3)).swapaxes(2, 3)  # pack over s
    pv = pack4(jnp.swapaxes(vq, 2, 3)).swapaxes(2, 3)
    kd = kq.astype(jnp.float32) * ksc[..., None]
    vd = vq.astype(jnp.float32) * vsc[..., None]

    if kv_bshd:
        pk, pv = pk.transpose(0, 2, 1, 3), pv.transpose(0, 2, 1, 3)
        ksc_in, vsc_in = ksc.transpose(0, 2, 1), vsc.transpose(0, 2, 1)
    else:
        ksc_in, vsc_in = ksc, vsc

    out, lse = attention_bhsd(
        q, pk, pv, kv_seq_lens=lens, k_scale=ksc_in, v_scale=vsc_in,
        kv_bshd=kv_bshd, kv_bits=4,
    )
    want, want_lse = attention_bhsd(q, kd, vd, kv_seq_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-4, atol=1e-5)


def _cfg():
    return ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )


def _hf_and_params():
    """Random-init HF model + transplanted params (the CLAUDE.md e2e
    invariant: anchor to a CPU fp32 HF transformer oracle)."""
    import torch
    import transformers

    from hydragen_tpu.models import hf as hfmod

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg, params = hfmod.from_hf_model(model, dtype="float32")
    return model, cfg, params


def _forced_logits(cfg, params, kv_quant, prompt, suffix, overrides,
                   unique_bshd=None):
    eng = HydragenLlama(cfg, params)
    eng.setup_caches(8, 24, [1, 4], [16, 8], kv_quant=kv_quant,
                     unique_bshd=unique_bshd)
    _, logits = eng.generate(
        input_ids=[prompt, suffix], num_return_sequences=2,
        max_new_tokens=overrides.shape[1], temperature=0.0,
        return_logits=True, token_overrides=overrides,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    return [np.asarray(l) for l in logits]


def test_kv4_engine_e2e_logits_close_and_layout_invariant():
    import torch

    hf_model, cfg, params = _hf_and_params()
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 10)).astype(np.int32)
    suffix = rng.randint(1, 256, (4, 6)).astype(np.int32)
    overrides = rng.randint(1, 256, (8, 6)).astype(np.int32)

    l_fp = _forced_logits(cfg, params, None, prompt, suffix, overrides)
    # HF ORACLE anchor for the fp reference itself (CLAUDE.md e2e
    # invariant): generate's logits list leads with the PREFILL logits and
    # decode step t consumes overrides[:, t] (engine.py token_overrides),
    # so l_fp[t][row] = HF prediction after consuming
    # prompt + suffix_row + overrides[row, :t].
    P, S = prompt.shape[1], suffix.shape[1]
    for row in range(8):
        seq = np.concatenate([prompt[0], suffix[row // 2], overrides[row]])
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(seq)[None]).logits[0].numpy()
        for step in range(len(l_fp)):
            want = hf_logits[P + S - 1 + step]
            got = l_fp[step][row]
            rd = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
            assert rd < 2e-2, f"fp engine vs HF oracle row {row} step {step}: {rd}"

    l_4 = _forced_logits(cfg, params, "int4", prompt, suffix, overrides)
    l_4b = _forced_logits(cfg, params, "int4", prompt, suffix, overrides,
                          unique_bshd=True)
    for a, b in zip(l_fp, l_4):
        assert np.abs(a - b).mean() < 0.25 * np.abs(a).mean() + 0.05
    # Layouts compute the identical math.
    for a, b in zip(l_4, l_4b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_kv4_unsupported_paths_error_clearly():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = HydragenLlama(cfg, params)
    eng.setup_caches(4, 16, [1], [8], kv_quant="int4")

    prompt = np.ones((1, 6), np.int32)
    with pytest.raises(ValueError, match="disable_hydragen.*int4"):
        eng.generate(input_ids=[prompt], num_return_sequences=4,
                     max_new_tokens=2, temperature=0.0,
                     shared_cache_op=SharedCacheOp.WIPE,
                     disable_hydragen=True)

    from hydragen_tpu.core.batching import ContinuousBatcher

    eng2 = HydragenLlama(cfg, params)
    eng2.setup_caches(4, 16, [1], [8], kv_quant="int4")
    eng2.append_shared(prompt)
    with pytest.raises(AssertionError, match="int4"):
        ContinuousBatcher(eng2)


def test_kv4_accepts_explicit_equal_seq_lens():
    """Callers (e.g. scripts/needles.py) pass explicit suffix seq_lens even
    for rectangular batches; all-equal lens must resolve to the uniform
    decode write path (ragged would be rejected under int4)."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = HydragenLlama(cfg, params)
    eng.setup_caches(4, 16, [1], [12], kv_quant="int4")
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 8)).astype(np.int32)
    suffix = rng.randint(1, 256, (4, 4)).astype(np.int32)
    out = np.asarray(eng.generate(
        input_ids=[prompt, suffix],
        seq_lens=[np.full((1,), 8, np.int32), np.full((4,), 4, np.int32)],
        num_return_sequences=1, max_new_tokens=4, temperature=0.0,
        shared_cache_op=SharedCacheOp.WIPE,
    ))
    assert out.shape == (4, 4)

    # Genuinely ragged suffixes still reject with the clear message.
    with pytest.raises(AssertionError, match="uniform decode positions"):
        eng2 = HydragenLlama(cfg, params)
        eng2.setup_caches(4, 16, [1], [12], kv_quant="int4")
        eng2.generate(
            input_ids=[prompt, suffix],
            seq_lens=[np.full((1,), 8, np.int32),
                      np.asarray([4, 3, 4, 2], np.int32)],
            num_return_sequences=1, max_new_tokens=4, temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
        )
