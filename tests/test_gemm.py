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


def _forced_logits(cfg, params, quantization, prompt, overrides):
    """Per-step logits along a FORCED token stream: random-init logits are
    near-uniform, so greedy token agreement between two engines is a coin
    flip on the first near-tie (the chains then diverge completely) — a
    flaky assertion. token_overrides pins both engines to one stream; the
    logits comparison then measures exactly the matmul-path noise."""
    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp

    eng = HydragenLlama(cfg, params, quantization=quantization)
    eng.setup_caches(4, 16, [1], [8])
    _, logits = eng.generate(
        input_ids=[prompt], num_return_sequences=4,
        max_new_tokens=overrides.shape[1], temperature=0.0,
        return_logits=True, token_overrides=overrides,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    return [np.asarray(l) for l in logits]


def test_w8a8_matmul_cached_layer_select():
    """The stacked-weight GEMM (layer index via scalar prefetch) must equal
    the per-layer w8a8 reference on exactly the requested layer."""
    from hydragen_tpu.ops.gemm import quantize_rows, w8a8_matmul_cached

    rng = np.random.RandomState(4)
    L, M, K, N = 3, 24, 256, 256
    x = jnp.asarray(rng.randn(M, K), jnp.float32)
    w_all = jnp.asarray(rng.randint(-127, 128, (L, N, K)), jnp.int8)
    ws_all = jnp.asarray(rng.rand(L, N) * 0.02 + 1e-3, jnp.float32)
    a_q, a_s = quantize_rows(x)
    for li in (0, 2):
        out = w8a8_matmul_cached(
            jnp.int32(li), a_q, a_s, w_all, ws_all,
            block_n=128, block_k=128, out_dtype=jnp.float32, interpret=True,
        )
        ref = w8a8_reference(a_q, a_s, w_all[li], ws_all[li],
                             out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_w4a8_matmul_cached_layer_select():
    from hydragen_tpu.ops.gemm import (
        quantize_rows, w4a8_matmul_cached, w4a8_reference,
    )
    from hydragen_tpu.ops.quant import pack4

    rng = np.random.RandomState(5)
    L, M, K, N, G = 3, 16, 512, 256, 4  # group 128
    x = jnp.asarray(rng.randn(M, K), jnp.float32)
    q4 = jnp.asarray(rng.randint(-7, 8, (L, N, K)), jnp.int8)
    wp_all = pack4(q4)
    gs_all = jnp.asarray(rng.rand(L, G, N) * 0.05 + 1e-3, jnp.float32)
    a_q, a_s = quantize_rows(x)
    for li in (0, 1):
        out = w4a8_matmul_cached(
            jnp.int32(li), a_q, a_s, wp_all, gs_all,
            block_n=128, block_kp=128, out_dtype=jnp.float32, interpret=True,
        )
        ref = w4a8_reference(a_q, a_s, wp_all[li], gs_all[li],
                             out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_w8a8_engine_e2e(monkeypatch):
    """Engine quantization="w8a8" routes layer matmuls through the Pallas
    s8 GEMM (interpret mode on CPU via HYDRAGEN_W8A8_INTERPRET); its logits
    along a forced token stream stay within per-row activation-quant noise
    of the weight-only int8 engine's."""
    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    # Route EVERY family through the s8 kernel (the engine default keeps
    # only the measured-faster gate/up there) so the test exercises the
    # full w8a8 path.
    monkeypatch.setenv("HYDRAGEN_W8A8_FAMILIES", "all")
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 6)).astype(np.int32)
    overrides = rng.randint(1, 256, (4, 5)).astype(np.int32)

    l_dq = _forced_logits(cfg, params, "int8", prompt, overrides)
    l_w8 = _forced_logits(cfg, params, "w8a8", prompt, overrides)
    for a, b in zip(l_dq, l_w8):
        assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05


# ---------------------------------------------------------------------------
# W4A8 (int4 planar-packed weights)
# ---------------------------------------------------------------------------

def test_pack4_unpack4_roundtrip():
    from hydragen_tpu.ops.quant import pack4, unpack4

    rng = np.random.RandomState(2)
    q4 = jnp.asarray(rng.randint(-8, 8, (3, 64)), jnp.int8)
    lo, hi = unpack4(pack4(q4))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(q4[:, :32]))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(q4[:, 32:]))


def test_quantize4_roundtrip():
    from hydragen_tpu.ops.quant import dequantize4, quantize4

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(512, 384), jnp.float32)
    t = quantize4(w, group=128)
    assert t.qp.shape == (384, 256) and t.gscale.shape == (4, 384)
    assert t.group_size == 128 and t.in_features == 512
    back = np.asarray(dequantize4(t, jnp.float32))
    err = np.abs(back - np.asarray(w))
    # Max error <= half an int4 step of the *group* amax (+ bf16 scale ulp).
    gamax = np.abs(np.asarray(w)).reshape(4, 128, 384).max(axis=1)
    bound = np.repeat(gamax, 128, axis=0) / 7.0 * 0.51
    assert (err <= bound + 1e-6).all(), (err.max(), bound.min())


def test_quantize4_outlier_channels_localized():
    """An outlier K-row only degrades its own group — the point of
    group-wise over per-channel scales at 4 bits."""
    from hydragen_tpu.ops.quant import dequantize4, quantize4

    rng = np.random.RandomState(4)
    w = rng.randn(512, 128).astype(np.float32)
    w[13, :] *= 50.0  # one outlier in group 0
    t = quantize4(jnp.asarray(w), group=128)
    back = np.asarray(dequantize4(t, jnp.float32))
    err_clean = np.abs(back[128:] - w[128:]).max()
    amax_clean = np.abs(w[128:]).max()
    assert err_clean <= amax_clean / 7.0  # unaffected by group 0's outlier


@pytest.mark.parametrize(
    "m,k,n,bm,bn,bkp",
    [
        (8, 256, 256, None, 128, 128),    # kb=1, one group per block
        (12, 512, 384, 8, 128, 128),      # M padding + 2 K-blocks
        (64, 512, 256, 32, 256, 256),     # 2 groups per block per plane
    ],
)
def test_w4a8_matmul_parity(m, k, n, bm, bn, bkp):
    from hydragen_tpu.ops.gemm import w4a8_matmul, w4a8_reference
    from hydragen_tpu.ops.quant import quantize4

    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)  # logical [in, out]
    t = quantize4(w, group=128)

    a_q, a_s = quantize_rows(a)
    out = w4a8_matmul(a_q, a_s, t.qp, t.gscale, block_m=bm, block_n=bn,
                      block_kp=bkp, out_dtype=jnp.float32, interpret=True)
    ref = w4a8_reference(a_q, a_s, t.qp, t.gscale, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_w4a8_qmatmul_dq_path_matches_dequantized():
    from hydragen_tpu.ops.quant import dequantize4, qmatmul, quantize4

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 3, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 384), jnp.float32)
    t = quantize4(w, group=128)
    got = qmatmul(x, t, "bth,hd->btd", impl="dq")
    want = jnp.einsum("bth,hd->btd", x, dequantize4(t, jnp.float32))
    # The dq path sums two per-plane einsums (fusion-friendly split,
    # ops/quant.py) — f32 accumulation order differs from the single
    # dequantize4 einsum by ~1e-5 on O(10) values.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_w4a8_engine_e2e(monkeypatch):
    """quantization="w4a8" (kernel, via interpret opt-in) stays within
    activation-quant noise of quantization="int4" (weight-only dq path) on
    logits along a forced token stream (same weights; only the matmul
    path differs — see _forced_logits for why tokens are not compared)."""
    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 6)).astype(np.int32)
    overrides = rng.randint(1, 256, (4, 5)).astype(np.int32)

    l_int4 = _forced_logits(cfg, params, "int4", prompt, overrides)
    l_w4a8 = _forced_logits(cfg, params, "w4a8", prompt, overrides)
    for a, b in zip(l_int4, l_w4a8):
        assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean() + 0.05


def test_mixed_engine_e2e(monkeypatch):
    """quantization="mixed" (int8 weights + INT4 down via the w4a8 kernel,
    the measured decode-optimal per-family mix) stays within quant noise of
    the weight-only int8 engine on logits along a forced token stream, and
    actually carries an int4 down projection."""
    monkeypatch.setenv("HYDRAGEN_W8A8_INTERPRET", "1")
    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.config import ModelConfig
    from hydragen_tpu.models.llama import init_params
    from hydragen_tpu.ops.quant import Quantized4Tensor, QuantizedTensor

    cfg = ModelConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 256, (1, 6)).astype(np.int32)
    overrides = rng.randint(1, 256, (4, 5)).astype(np.int32)

    eng = HydragenLlama(cfg, params, quantization="mixed")
    assert isinstance(eng.params["layers"]["down"], Quantized4Tensor)
    assert isinstance(eng.params["layers"]["wq"], QuantizedTensor)
    assert eng.matmul_impl == "w8a8"

    l_int8 = _forced_logits(cfg, params, "int8", prompt, overrides)
    l_mix = _forced_logits(cfg, params, "mixed", prompt, overrides)
    for a, b in zip(l_int8, l_mix):
        assert np.abs(a - b).mean() < 0.06 * np.abs(a).mean() + 0.06
