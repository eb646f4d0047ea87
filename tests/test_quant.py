"""INT8 weight-only quantization: op correctness + end-to-end quality."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.ops.quant import QuantizedTensor, dequantize, qmatmul, quantize, quantize_params


def test_quantize_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    t = quantize(w)
    assert t.q.dtype == jnp.int8 and t.q.shape == (128, 64)  # stored [out, in]
    assert t.scale.shape == (128,)
    back = dequantize(t, jnp.float32)
    # int8 symmetric: max relative error per channel ~ 1/127 of channel amax
    # (the scale itself is bf16-rounded before quantization, widening the
    # half-step bound by at most one bf16 ulp, 2^-9 relative).
    err = np.abs(np.asarray(back - w))
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert (err <= amax / 127.0 * 0.5 * (1 + 2.0**-8) + 1e-6).all()


def test_qmatmul_matches_dequantized():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 3, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 128), jnp.float32)
    t = quantize(w)
    got = qmatmul(x, t, "bth,hd->btd")
    want = jnp.einsum("bth,hd->btd", x, dequantize(t, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3)


def test_quantized_engine_generates_same_argmax_mostly():
    """Greedy tokens from the int8 engine should mostly match fp32."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))

    def run(quantization):
        eng = HydragenLlama(cfg, params, quantization=quantization)
        eng.setup_caches(2, 16, [1], [8])
        rng = np.random.RandomState(0)
        out, logits = eng.generate(
            input_ids=[rng.randint(1, 128, (1, 6)).astype(np.int32),
                       rng.randint(1, 128, (2, 3)).astype(np.int32)],
            max_new_tokens=6, temperature=0.0, return_logits=True,
            shared_cache_op=SharedCacheOp.WIPE,
        )
        return np.asarray(out), [np.asarray(l) for l in logits]

    t_fp, l_fp = run(None)
    t_q, l_q = run("int8")
    # Logits close in relative terms (random-init logits are O(1)).
    for a, b in zip(l_fp, l_q):
        assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05
    # Tokens need not be identical everywhere, but must mostly agree.
    assert (t_fp == t_q).mean() >= 0.5


def test_pad_intermediate_is_exact():
    """Zero-padding the MLP intermediate dim (s8-GEMM N-tile alignment,
    ops/quant.py pad_intermediate) must not change the computed function:
    padded gate/up out-cols are zero, silu(0)*0 = 0, and down's padded
    in-rows are zero."""
    import jax.numpy as jnp

    from hydragen_tpu.ops.quant import pad_intermediate, qmatmul, quantize

    rng = np.random.RandomState(3)
    L, H, I = 2, 64, 576  # 576 >= 512 and not a 512 multiple -> pads to 1024
    layers = {
        "gate": jnp.asarray(rng.randn(L, H, I), jnp.float32),
        "up": jnp.asarray(rng.randn(L, H, I), jnp.float32),
        "down": jnp.asarray(rng.randn(L, I, H), jnp.float32),
    }
    padded = pad_intermediate(layers)
    assert padded["gate"].shape == (L, H, 1024)
    assert padded["down"].shape == (L, 1024, H)

    x = jnp.asarray(rng.randn(2, 3, H), jnp.float32)

    def mlp(ls):
        g = qmatmul(x, quantize(ls["gate"][0]), "bth,hi->bti")
        u = qmatmul(x, quantize(ls["up"][0]), "bth,hi->bti")
        h = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        return qmatmul(h, quantize(ls["down"][0]), "bti,ih->bth")

    np.testing.assert_allclose(
        np.asarray(mlp(layers)), np.asarray(mlp(padded)), rtol=2e-2,
        atol=1e-3,
    )


def test_kv_quant_roundtrip():
    from hydragen_tpu.ops.quant import dequantize_kv, quantize_kv

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 5, 64), jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 5)
    back = dequantize_kv(q, s, jnp.float32)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(back - x)) <= amax / 127.0 * 0.5 + 1e-6).all()


def test_kv_quant_engine_close_to_fp():
    """int8 KV cache: logits close to the fp cache engine, incl. the
    hierarchy + nrs path and the disable_hydragen baseline path."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    shared = rng.randint(1, 128, (1, 6)).astype(np.int32)
    suffix = rng.randint(1, 128, (2, 3)).astype(np.int32)

    def run(kv_quant, disable_hydragen=False):
        eng = HydragenLlama(cfg, params)
        eng.setup_caches(4, 24, [1, 2], [8, 8], kv_quant=kv_quant)
        out, logits = eng.generate(
            input_ids=[shared, suffix],
            num_return_sequences=2 if not disable_hydragen else 1,
            max_new_tokens=5, temperature=0.0, return_logits=True,
            shared_cache_op=SharedCacheOp.WIPE,
            disable_hydragen=disable_hydragen,
        )
        return np.asarray(out), [np.asarray(l) for l in logits]

    for disable in (False, True):
        t_fp, l_fp = run(None, disable)
        t_q, l_q = run("int8", disable)
        for a, b in zip(l_fp, l_q):
            assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05
        assert (t_fp == t_q).mean() >= 0.5


def test_quantized_params_sharding():
    from hydragen_tpu.parallel import make_mesh, shard_params

    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        dtype="float32",
    )
    qp = quantize_params(init_params(cfg, jax.random.PRNGKey(0)))
    mesh = make_mesh(tp=4)
    sp = shard_params(qp, cfg, mesh)
    wq = sp["layers"]["wq"]
    assert isinstance(wq, QuantizedTensor)
    hq = cfg.num_attention_heads * cfg.head_dim
    # Payload stored [L, out, in]; out-features sharded over tp.
    assert {s.data.shape for s in wq.q.addressable_shards} == {
        (cfg.num_hidden_layers, hq // 4, cfg.hidden_size)
    }
    assert {s.data.shape for s in wq.scale.addressable_shards} == {
        (cfg.num_hidden_layers, hq // 4)
    }


def test_quantized4_params_sharding_and_tp_parity():
    """INT4 params place on a tp mesh (payload out-sharded; group scales
    replicated or in-sharded per divisibility) and the sharded engine's
    greedy tokens match unsharded (the mesh path runs the dq unpack —
    GSPMD partitions the logical arrays, ops/quant.py qmatmul)."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.ops.quant import Quantized4Tensor
    from hydragen_tpu.parallel import make_mesh, shard_params

    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    cfg = ModelConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        dtype="float32",
    )
    qp = quantize_params(init_params(cfg, jax.random.PRNGKey(0)), bits=4)
    mesh = make_mesh(tp=4)
    sp = shard_params(qp, cfg, mesh)
    wq = sp["layers"]["wq"]
    assert isinstance(wq, Quantized4Tensor)
    hq = cfg.num_attention_heads * cfg.head_dim
    # Packed payload stored [L, out, in//2]; out-features sharded over tp.
    assert {s.data.shape for s in wq.qp.addressable_shards} == {
        (cfg.num_hidden_layers, hq // 4, cfg.hidden_size // 2)
    }

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 128, (1, 6)).astype(np.int32)

    def run(mesh):
        eng = HydragenLlama(cfg, qp, mesh=mesh)
        eng.setup_caches(4, 16, [1], [8])
        return np.asarray(eng.generate(
            input_ids=[prompt], num_return_sequences=4, max_new_tokens=4,
            temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
        ))

    ref = run(None)
    out = run(mesh)
    assert (out == ref).all(), f"int4 tp diverged: {out} vs {ref}"
