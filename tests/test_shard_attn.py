"""shard_map'd Pallas attention under a (dp, sp, tp) mesh (VERDICT r2 #2).

Round 2 forced every sharded attention onto XLA; these tests pin the round-3
fix: the Pallas kernels run per-shard inside shard_map (interpret mode on
the forced 8-device CPU mesh) with exact LSE merging across the sp axis,
and the engine routes large sharded prefills through them.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.ops.reference import attention_bhsd
from hydragen_tpu.parallel import make_mesh
from hydragen_tpu.parallel.shard_attn import (
    mesh_attention_eligible,
    sharded_causal_attention,
    sharded_level_attention,
)


def _mk_level(key, sb, hkv, S, d, quantized):
    ks = jax.random.split(key, 4)
    if quantized:
        k = jax.random.randint(ks[0], (sb, hkv, S, d), -127, 128, dtype=jnp.int8)
        v = jax.random.randint(ks[1], (sb, hkv, S, d), -127, 128, dtype=jnp.int8)
        ksc = jax.random.uniform(ks[2], (sb, hkv, S), dtype=jnp.float32) * 0.02 + 1e-3
        vsc = jax.random.uniform(ks[3], (sb, hkv, S), dtype=jnp.float32) * 0.02 + 1e-3
        return (k, ksc), (v, vsc)
    k = jax.random.normal(ks[0], (sb, hkv, S, d), dtype=jnp.float32)
    v = jax.random.normal(ks[1], (sb, hkv, S, d), dtype=jnp.float32)
    return (k, None), (v, None)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("lens_val", [None, 1500, 900])
def test_sharded_level_attention_parity(quantized, lens_val):
    """dp=2/sp=2/tp=2: per-shard kernel + sp LSE-merge == global oracle.

    lens 1500 makes sp-shard 1 partially masked; 900 fully masks it (its
    lse is -inf and the merge must drop it exactly)."""
    mesh = make_mesh(tp=2, dp=2, sp=2)
    b, hq, hkv, sb, S, d, m = 4, 4, 4, 1, 2048, 32, 2
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, hq, m, d), dtype=jnp.float32)
    (k, ksc), (v, vsc) = _mk_level(jax.random.PRNGKey(1), sb, hkv, S, d, quantized)
    lens = None if lens_val is None else jnp.full((sb,), lens_val, jnp.int32)

    assert mesh_attention_eligible(mesh, b, hq, hkv, sb, S)
    out, lse = sharded_level_attention(
        q,
        (k, ksc) if quantized else k,
        (v, vsc) if quantized else v,
        lens,
        mesh=mesh,
        interpret=True,
    )

    # Oracle: fold globally, plain attention, unfold.
    from hydragen_tpu.ops.hydragen import (
        fold_queries_for_shared,
        unfold_shared_lse,
        unfold_shared_out,
    )

    bq = fold_queries_for_shared(q, sb)
    o0, l0 = attention_bhsd(
        bq, k, v, kv_seq_lens=lens, k_scale=ksc, v_scale=vsc
    )
    o0 = unfold_shared_out(o0, b, m)
    l0 = unfold_shared_lse(l0, b, m)

    np.testing.assert_allclose(np.asarray(out), np.asarray(o0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(l0), atol=1e-3)


def test_sharded_causal_attention_parity():
    mesh = make_mesh(tp=2, dp=2, sp=2)
    b, hq, hkv, t, d = 4, 4, 4, 256, 32
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (b, hq, t, d), dtype=jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(3), (b, hkv, t, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(4), (b, hkv, t, d), dtype=jnp.float32)
    out, lse = sharded_causal_attention(q, k, v, mesh=mesh, interpret=True)
    o0, l0 = attention_bhsd(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(l0), atol=1e-3)


def test_engine_routes_sharded_prefill_through_kernel(monkeypatch):
    """A >=1024-token sharded unique prefill must trace the shard_map'd
    kernel AND match the unsharded engine's greedy tokens."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params
    import hydragen_tpu.parallel.shard_attn as shard_attn

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=4096, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 127, (1, 2048)).astype(np.int32)
    suffix = rng.randint(1, 127, (8, 64)).astype(np.int32)

    def run(mesh):
        eng = HydragenLlama(cfg, params, mesh=mesh)
        eng.setup_caches(8, 96, [1], [2048])
        return np.asarray(eng.generate(
            input_ids=[prompt, suffix], num_return_sequences=1,
            max_new_tokens=4, temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
        ))

    calls = {"n": 0}
    real = shard_attn.sharded_level_attention

    def counting(*a, **kw):
        calls["n"] += 1
        kw.setdefault("interpret", True)
        return real(*a, **kw)

    monkeypatch.setattr(shard_attn, "sharded_level_attention", counting)

    ref = run(None)
    out = run(make_mesh(tp=2, dp=2, sp=2))
    assert calls["n"] > 0, "sharded prefill did not route through the kernel"
    assert (ref == out).all()
