"""Round-3 behaviors: mixed KV precision (int8 unique / bf16 shared).

The shared prefix is stored once and read once per step regardless of
batch, so quantizing it buys almost no bandwidth while its dequant commute
costs a VPU pass per score at every read (the 16K decode tail is
VPU-softmax-bound, docs/results_v5e.md). ``shared_kv_quant="none"`` keeps
shared levels in the compute dtype while the bandwidth-bound unique cache
stays int8 — faster AND more exact.
"""

import numpy as np

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params

CFG = ModelConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    dtype="float32",
)


def _gen(eng, disable=False, levels=1):
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 255, (1, 16)).astype(np.int32)
    inputs = [prompt]
    if levels == 2:
        inputs.append(rng.randint(1, 255, (2, 8)).astype(np.int32))
    suffix = rng.randint(1, 255, (4, 6)).astype(np.int32)
    inputs.append(suffix)
    return np.asarray(eng.generate(
        input_ids=inputs, num_return_sequences=1, max_new_tokens=6,
        temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
        disable_hydragen=disable,
    ))


def _engine(kv_quant, shared_kv, levels=1):
    eng = HydragenLlama(CFG, init_params(CFG, jax.random.PRNGKey(0)))
    eng.setup_caches(
        4, 64, [1, 2][:levels], [16, 8][:levels],
        kv_quant=kv_quant, shared_kv_quant=shared_kv,
    )
    return eng


def _agree(a, b):
    return float((a == b).mean())


def test_mixed_kv_matches_fp():
    ref = _gen(_engine(None, "follow"))
    mixed = _engine("int8", "none")
    assert mixed.cache.quantized and not mixed.cache.shared[0].quantized
    out = _gen(mixed)
    # int8 unique-KV noise can flip greedy near-ties on random weights; the
    # mixed cache must track fp32 at least as well as the fully-int8 one.
    full = _gen(_engine("int8", "follow"))
    assert _agree(ref, out) >= _agree(ref, full)
    assert _agree(ref, out) >= 0.7


def test_mixed_kv_two_levels():
    ref = _gen(_engine(None, "follow", levels=2), levels=2)
    out = _gen(_engine("int8", "none", levels=2), levels=2)
    assert _agree(ref, out) >= 0.7


def test_mixed_kv_noshared_transcode():
    """disable_hydragen copies the bf16 shared level into the int8 unique
    cache — the copy must quantize on the fly (copy_shared_to_unique)."""
    ref = _gen(_engine(None, "follow"), disable=True)
    out = _gen(_engine("int8", "none"), disable=True)
    assert _agree(ref, out) >= 0.7


def test_shared_cached_flash_parity():
    """flash_attention_cached_bhsd on the stacked [L, ...] buffers must equal
    flash_attention_bhsd on the per-layer slice (incl. int8 + ragged lens +
    allocated batch > used batch)."""
    from hydragen_tpu.ops.flash import (
        flash_attention_bhsd,
        flash_attention_cached_bhsd,
    )

    L, SB, sb, hkv, S, d, hq, m = 3, 3, 2, 4, 64, 128, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (sb, hq, m, d), dtype=jnp.float32)
    k_all = jax.random.normal(ks[1], (L, SB, hkv, S, d), dtype=jnp.float32)
    v_all = jax.random.normal(ks[2], (L, SB, hkv, S, d), dtype=jnp.float32)
    lens = jnp.array([S, 37], jnp.int32)
    for li in (0, 2):
        o1, l1 = flash_attention_cached_bhsd(
            jnp.int32(li), q, k_all, v_all, kv_seq_lens=lens, interpret=True,
        )
        o0, l0 = flash_attention_bhsd(
            q, k_all[li, :sb], v_all[li, :sb], kv_seq_lens=lens,
            interpret=True,
        )
        assert jnp.allclose(o1, o0, atol=1e-5), f"layer {li} out mismatch"
        assert jnp.allclose(l1, l0, atol=1e-5), f"layer {li} lse mismatch"

    # int8 payload + scales
    kq = jax.random.randint(ks[3], (L, SB, hkv, S, d), -127, 128, dtype=jnp.int8)
    vq = jax.random.randint(ks[4], (L, SB, hkv, S, d), -127, 128, dtype=jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[0], (L, SB, hkv, S))) * 0.01 + 1e-3
    vsc = jnp.abs(jax.random.normal(ks[1], (L, SB, hkv, S))) * 0.01 + 1e-3
    o1, l1 = flash_attention_cached_bhsd(
        jnp.int32(1), q, kq, vq, kv_seq_lens=lens,
        k_scale_all=ksc, v_scale_all=vsc, interpret=True,
    )
    o0, l0 = flash_attention_bhsd(
        q, kq[1, :sb], vq[1, :sb], kv_seq_lens=lens,
        k_scale=ksc[1, :sb], v_scale=vsc[1, :sb], interpret=True,
    )
    assert jnp.allclose(o1, o0, atol=1e-5)
    assert jnp.allclose(l1, l0, atol=1e-5)


def test_engine_routes_shared_cached():
    """With impl='pallas' on a (patched) TPU backend, shared-level reads go
    through the cached stacked-buffer kernel and stay token-identical to
    impl='xla' (fp32 CPU numerics)."""
    import hydragen_tpu.models.llama as mllama
    import hydragen_tpu.ops.flash as fl

    cfg = ModelConfig(
        vocab_size=256, hidden_size=512, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 255, (1, 16)).astype(np.int32)
    suffix = rng.randint(1, 255, (4, 4)).astype(np.int32)

    calls = {"n": 0}
    real = fl.flash_attention_cached_bhsd
    real_flash = fl.flash_attention_bhsd

    def counting(*a, **kw):
        calls["n"] += 1
        kw["interpret"] = True
        return real(*a, **kw)

    def flash_interp(*a, **kw):
        # The backend patch below is global (mllama.jax IS jax), so every
        # kernel entry must be pinned to interpret mode on CPU.
        kw["interpret"] = True
        return real_flash(*a, **kw)

    def run(impl):
        eng = HydragenLlama(cfg, params, impl=impl)
        eng.setup_caches(4, 16, [1], [16])
        return np.asarray(eng.generate(
            input_ids=[prompt, suffix], num_return_sequences=1,
            max_new_tokens=6, temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
        ))

    orig_backend = jax.default_backend
    fl.flash_attention_cached_bhsd = counting
    fl.flash_attention_bhsd = flash_interp
    mllama.jax.default_backend = lambda: "tpu"
    try:
        out_pallas = run("pallas")
    finally:
        mllama.jax.default_backend = orig_backend
        fl.flash_attention_cached_bhsd = real
        fl.flash_attention_bhsd = real_flash
    assert calls["n"] > 0, "shared read did not route through the cached kernel"

    out_xla = run("xla")
    agree = (out_pallas == out_xla).mean()
    assert agree >= 0.8, f"cached-shared/xla token agreement {agree}"


def test_shared_int8_unique_bf16():
    """The inverse mix (int8 shared / bf16 unique) also runs: the transcode
    dequantizes on copy."""
    eng = HydragenLlama(CFG, init_params(CFG, jax.random.PRNGKey(0)))
    eng.setup_caches(4, 64, [1], [16], kv_quant=None, shared_kv_quant="int8")
    assert not eng.cache.quantized and eng.cache.shared[0].quantized
    ref = _gen(_engine(None, "follow"), disable=True)
    out = _gen(eng, disable=True)
    assert (ref == out).all()
