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


# ---------------------------------------------------------------------------
# Round 5: the decode fast paths under a mesh (VERDICT r4 item 1)
# ---------------------------------------------------------------------------


def test_sharded_level_attention_dp_sb_groups():
    """dp=2 with sb=2 distinct prefixes: the fold only commutes with a
    contiguous dp batch split when each dp shard holds whole prefix groups
    (sb shards alongside dp) — round 4's replicated-sb body mis-assigned
    rows to prefixes here."""
    mesh = make_mesh(tp=2, dp=2, sp=2)
    b, hq, hkv, sb, S, d, m = 8, 4, 4, 2, 512, 32, 1
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (b, hq, m, d), dtype=jnp.float32)
    (k, _), (v, _) = _mk_level(jax.random.PRNGKey(6), sb, hkv, S, d, False)
    # Distinct lens per prefix so any prefix mix-up changes the result.
    lens = jnp.array([200, 500], jnp.int32)

    assert mesh_attention_eligible(mesh, b, hq, hkv, sb, S)
    out, lse = sharded_level_attention(q, k, v, lens, mesh=mesh, interpret=True)

    from hydragen_tpu.ops.hydragen import (
        fold_queries_for_shared,
        unfold_shared_lse,
        unfold_shared_out,
    )

    bq = fold_queries_for_shared(q, sb)
    o0, l0 = attention_bhsd(bq, k, v, kv_seq_lens=lens)
    o0 = unfold_shared_out(o0, b, m)
    l0 = unfold_shared_lse(l0, b, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(l0), atol=1e-3)


def test_sharded_level_attention_rejects_unsplittable_fold():
    """dp=2, sb=3: no contiguous split holds whole prefix groups — the
    eligibility gate must reject (the XLA path takes over)."""
    mesh = make_mesh(tp=2, dp=2, sp=2)
    assert not mesh_attention_eligible(mesh, 12, 4, 4, 3, 512)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("sb,SB", [(1, 1), (2, 2)])
def test_sharded_shared_cached_parity(quantized, sb, SB):
    """Stacked-buffer cached level read per shard == global oracle on the
    selected layer's slice (layer index via scalar prefetch)."""
    from hydragen_tpu.parallel.shard_attn import (
        mesh_shared_cached_eligible,
        sharded_shared_cached_attention,
    )

    mesh = make_mesh(tp=2, dp=2, sp=2)
    b, hq, hkv, S, d, m, L = 8, 4, 4, 256, 128, 1, 2
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (b, hq, m, d), dtype=jnp.float32)
    levels = [
        _mk_level(jax.random.PRNGKey(10 + i), SB, hkv, S, d, quantized)
        for i in range(L)
    ]
    k_all = jnp.stack([lv[0][0] for lv in levels])
    v_all = jnp.stack([lv[1][0] for lv in levels])
    ks_all = jnp.stack([lv[0][1] for lv in levels]) if quantized else None
    vs_all = jnp.stack([lv[1][1] for lv in levels]) if quantized else None
    lens = jnp.full((sb,), 200, jnp.int32)

    assert mesh_shared_cached_eligible(mesh, b, hq, hkv, sb, SB, S)
    li = 1
    out, lse = sharded_shared_cached_attention(
        jnp.int32(li), q, k_all, v_all, lens, mesh=mesh,
        k_scale_all=ks_all, v_scale_all=vs_all, interpret=True,
    )

    from hydragen_tpu.ops.hydragen import (
        fold_queries_for_shared,
        unfold_shared_lse,
        unfold_shared_out,
    )

    bq = fold_queries_for_shared(q, sb)
    o0, l0 = attention_bhsd(
        bq, k_all[li][:sb], v_all[li][:sb], kv_seq_lens=lens,
        k_scale=None if not quantized else ks_all[li][:sb],
        v_scale=None if not quantized else vs_all[li][:sb],
    )
    o0 = unfold_shared_out(o0, b, m)
    l0 = unfold_shared_lse(l0, b, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o0), atol=3e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(l0), atol=2e-3)


@pytest.mark.parametrize("with_merges", [False, True])
def test_sharded_decode_kernel_parity(with_merges):
    """Int8 decode kernel per shard (rows over dp x sp, heads over tp, 4D
    scales flattened in-body) vs the XLA oracle + exact LSE merges."""
    from hydragen_tpu.ops.combine import combine_lse_with_stats
    from hydragen_tpu.parallel.shard_attn import (
        mesh_decode_kernel_eligible,
        sharded_decode_attention_cached,
    )

    mesh = make_mesh(tp=2, dp=2, sp=2)
    b = B = 8
    hq, hkv, U, d, L = 8, 4, 16, 128, 2
    ks = jax.random.split(jax.random.PRNGKey(21), 8)
    q = jax.random.normal(ks[0], (b, hq, 1, d), dtype=jnp.float32)
    k_all = jax.random.randint(ks[1], (L, B, U, hkv, d), -127, 128, dtype=jnp.int8)
    v_all = jax.random.randint(ks[2], (L, B, U, hkv, d), -127, 128, dtype=jnp.int8)
    ks4 = jax.random.uniform(ks[3], (L, B, U, hkv), dtype=jnp.float32) * 0.02 + 1e-3
    vs4 = jax.random.uniform(ks[4], (L, B, U, hkv), dtype=jnp.float32) * 0.02 + 1e-3
    lens = jax.random.randint(ks[5], (b,), 1, U + 1).astype(jnp.int32)
    # Engine invariant: payload/scales beyond each row's length are zero.
    tok = jnp.arange(U)[None, :, None]
    m3 = (tok < lens[:, None, None])[None]
    k_all = jnp.where(m3[..., None], k_all, 0)
    v_all = jnp.where(m3[..., None], v_all, 0)
    ks4 = jnp.where(m3, ks4, 0.0)
    vs4 = jnp.where(m3, vs4, 0.0)

    kwargs = {}
    if with_merges:
        k1 = jax.random.normal(ks[6], (b, hkv, 1, d), dtype=jnp.float32)
        v1 = jax.random.normal(ks[7], (b, hkv, 1, d), dtype=jnp.float32)
        o_sh = jax.random.normal(jax.random.PRNGKey(30), (b, hq, 1, d), jnp.float32)
        lse_sh = jax.random.normal(jax.random.PRNGKey(31), (b, hq, 1), jnp.float32)
        kwargs = {"own_kv": (k1, v1), "shared_partial": (o_sh, lse_sh)}

    assert mesh_decode_kernel_eligible(mesh, b, B, hq, hkv, 8)
    li = 1
    out, lse = sharded_decode_attention_cached(
        jnp.int32(li), q, k_all, v_all, kv_seq_lens=lens,
        k_scale4_all=ks4, v_scale4_all=vs4, mesh=mesh, interpret=True,
        **kwargs,
    )

    # Oracle: XLA attention on the layer's BSHD slice (+ exact merges).
    o0, l0 = attention_bhsd(
        q, k_all[li], v_all[li], kv_seq_lens=lens,
        k_scale=ks4[li], v_scale=vs4[li], kv_bshd=True,
    )
    outs, lses = [o0], [l0]
    if with_merges:
        oo, lo = attention_bhsd(q, kwargs["own_kv"][0], kwargs["own_kv"][1])
        outs += [oo, kwargs["shared_partial"][0]]
        lses += [lo, kwargs["shared_partial"][1]]
    o_ref, l_ref = combine_lse_with_stats(outs, lses)
    rel = float(jnp.max(jnp.abs(out - o_ref))) / float(jnp.max(jnp.abs(o_ref)))
    assert rel < 3e-2, f"out rel err {rel}"
    dl = float(jnp.max(jnp.abs(jnp.nan_to_num(lse - l_ref, neginf=0.0))))
    assert dl < 3e-2, f"lse err {dl}"


def test_sharded_decode_kernel_row_split_rules():
    from hydragen_tpu.parallel.shard_attn import (
        _decode_rows_split,
        mesh_decode_kernel_eligible,
    )

    # b == B: rows split over dp*sp.
    assert _decode_rows_split(2, 2, 8, 8) == 4
    # b < B only aligns unsharded.
    assert _decode_rows_split(2, 1, 4, 8) is None
    assert _decode_rows_split(1, 1, 4, 8) == 1
    # int4 mesh path is not wired (4D-scale writer absent): ineligible.
    mesh = make_mesh(tp=2, dp=2, sp=2)
    assert not mesh_decode_kernel_eligible(mesh, 8, 8, 8, 4, 4)


def test_engine_mesh_keeps_fast_paths(monkeypatch):
    """End to end: a (dp=2, tp=2) mesh engine with quantization='w8a8' and
    int8 KV must (a) keep ForwardSpec.matmul == 'w8a8', (b) trace the
    sharded s8 GEMM and the sharded decode kernel, and (c) match the
    unsharded engine's logits to quantization-noise tolerance."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params
    import hydragen_tpu.parallel.shard_attn as shard_attn
    import hydragen_tpu.parallel.shard_gemm as shard_gemm

    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    monkeypatch.setenv("HYDRAGEN_MESH_KERNELS_INTERPRET", "1")
    monkeypatch.setenv("HYDRAGEN_W8A8_FAMILIES", "all")

    cfg = ModelConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        dtype="float32",
    )
    assert cfg.head_dim == 128  # decode-kernel requirement
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    shared = rng.randint(1, 255, (1, 24)).astype(np.int32)
    suffix = rng.randint(1, 255, (8, 4)).astype(np.int32)

    def run(mesh, overrides=None):
        eng = HydragenLlama(cfg, params, quantization="w8a8", mesh=mesh)
        eng.setup_caches(8, 16, [1], [32], kv_quant="int8", unique_bshd=True)
        assert eng._spec("decode", unique_history=True).matmul == "w8a8"
        toks, logits = eng.generate(
            input_ids=[shared, suffix], max_new_tokens=4, temperature=0.0,
            return_logits=True, shared_cache_op=SharedCacheOp.WIPE,
            token_overrides=overrides,
        )
        return np.asarray(toks), np.stack([np.asarray(l) for l in logits])

    calls = {"dec": 0, "gemm": 0}
    real_dec = shard_attn.sharded_decode_attention_cached
    real_gemm = shard_gemm.sharded_qmatmul_stacked

    def counting_dec(*a, **kw):
        calls["dec"] += 1
        return real_dec(*a, **kw)

    def counting_gemm(*a, **kw):
        calls["gemm"] += 1
        return real_gemm(*a, **kw)

    monkeypatch.setattr(shard_attn, "sharded_decode_attention_cached", counting_dec)
    monkeypatch.setattr(shard_gemm, "sharded_qmatmul_stacked", counting_gemm)

    t0, l0 = run(None)
    assert calls["dec"] == 0 and calls["gemm"] == 0  # unsharded uses locals
    # token_overrides (the reference's e2e parity trick, test_e2e.py:110):
    # FAMILIES=all makes the two engines quantize o/down differently
    # (unsharded w8a8, mesh dq — row-parallel families keep dq by design),
    # so random-weight near-tie argmaxes can flip; forcing the token path
    # keeps per-step logits comparable.
    t1, l1 = run(make_mesh(tp=2, dp=2), overrides=t0)
    assert calls["dec"] > 0, "mesh decode did not trace the sharded kernel"
    assert calls["gemm"] > 0, "mesh run did not trace the sharded s8 GEMM"
    rel = np.max(np.abs(l1 - l0)) / max(np.max(np.abs(l0)), 1e-6)
    assert rel < 0.12, f"sharded w8a8 logits diverge: rel {rel}"


def test_sharded_row_parallel_w8a8_parity(monkeypatch):
    """Row-parallel sharded w8a8 GEMM (per-shard K-slice quantization +
    exact bf16 psum) vs the f32 oracle on the un-sliced activation, within
    quantization noise."""
    from hydragen_tpu.ops.gemm import w8a8_reference
    from hydragen_tpu.ops.quant import QuantizedTensor, quantize
    from hydragen_tpu.parallel.shard_gemm import (
        mesh_s8_gemm_row_eligible,
        sharded_qmatmul_stacked_row,
    )

    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    mesh = make_mesh(tp=2, dp=2)
    L, N, K, M = 3, 256, 512, 16
    key = jax.random.PRNGKey(11)
    w = jax.random.normal(key, (L, K, N), jnp.float32)
    wq = quantize(w)  # stacked [L, N, K] payload + [L, N] scales
    x = jax.random.normal(jax.random.PRNGKey(12), (M, K), jnp.float32)

    assert mesh_s8_gemm_row_eligible(mesh, M, K, wq, "w8a8")
    li = 1
    y = sharded_qmatmul_stacked_row(
        jnp.int32(li), x, wq, mesh=mesh, interpret=True
    )

    # Oracle: global per-row quantization + exact f32 reference on the
    # selected layer (per-shard row scales differ from the global one, so
    # compare with w8a8-noise tolerance, not exactly).
    from hydragen_tpu.ops.gemm import quantize_rows

    a_q, a_s = quantize_rows(x)
    ref = w8a8_reference(
        a_q, a_s, wq.q[li], wq.scale[li], out_dtype=jnp.float32
    )
    rel = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))) / float(
        jnp.max(jnp.abs(ref))
    )
    assert rel < 3e-2, f"row-parallel w8a8 rel err {rel}"
