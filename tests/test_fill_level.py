"""In-scan shared-level fill (model_forward ``fill_level``) parity.

The fill path writes each layer's new KV straight into the level buffers
inside the scan carry, so the stacked ``[L, b, hkv, t, hd]`` new-KV array
of the default path never exists (a full second copy of the level beside
the destination — 4.4 GB at 7B/16K int8, the term that kept every 16K x 7B
sweep cell "exceeds HBM" through round 5). The math must be bitwise the
stacked path's: same per-layer quantization, same buffers, same hidden.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.core.cache import (
    allocate_cache,
    fill_shared_level,
    set_shared_level_buffers,
)
from hydragen_tpu.core.engine import HydragenLlama
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import ForwardSpec, init_params, model_forward

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    dtype="float32",
)


def _spec(num_used=0):
    return ForwardSpec(
        mode="shared_prefill",
        num_used_levels=num_used,
        level_filled=(),
        unique_history=False,
        unique_filled=0,
        disable_hydragen=False,
        disable_attention=False,
        impl="xla",
        sharded=False,
        matmul="dq",
        level_batch=(),
    )


@pytest.mark.parametrize("quantized", [False, True], ids=["bf16", "int8"])
def test_fill_level_matches_stacked_path(quantized):
    params = init_params(CFG, jax.random.PRNGKey(0))
    cache = allocate_cache(
        CFG.num_hidden_layers, 4, 16, [2], [24],
        CFG.num_key_value_heads, CFG.head_dim,
        dtype=jnp.float32, quantized=quantized,
        shared_quantized=quantized,
    )
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 127, (2, 20)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(20)[None], (2, 20)).astype(jnp.int32)
    seq_lens = jnp.asarray([20, 17], jnp.int32)
    spec = _spec()
    qbits = 8 if quantized else None

    h_st, nk, nv = model_forward(
        params, CFG, cache, ids, pos, pos, spec, quantize_new_kv=qbits
    )
    cache_st = fill_shared_level(cache, 0, nk, nv, seq_lens)

    h_fl, (kb, vb, ksb, vsb) = model_forward(
        params, CFG, cache, ids, pos, pos, spec,
        quantize_new_kv=qbits, fill_level=0,
    )
    cache_fl = set_shared_level_buffers(cache, 0, kb, vb, ksb, vsb, seq_lens)

    np.testing.assert_array_equal(np.asarray(h_st), np.asarray(h_fl))
    st, fl = cache_st.shared[0], cache_fl.shared[0]
    # Written region must be bitwise identical (beyond t the fill path keeps
    # the allocation's zeros, like the stacked path's _block_update).
    np.testing.assert_array_equal(np.asarray(st.k), np.asarray(fl.k))
    np.testing.assert_array_equal(np.asarray(st.v), np.asarray(fl.v))
    np.testing.assert_array_equal(
        np.asarray(st.seq_lens), np.asarray(fl.seq_lens)
    )
    if quantized:
        np.testing.assert_array_equal(
            np.asarray(st.k_scale), np.asarray(fl.k_scale)
        )
        np.testing.assert_array_equal(
            np.asarray(st.v_scale), np.asarray(fl.v_scale)
        )


def test_engine_shared_prefill_uses_fill_path_hierarchy(monkeypatch):
    """Two-level append_shared through the engine with the fill_level route
    forced (the production gate picks it only above ~768 MB of stacked
    new-KV — HYDRAGEN_FILL_LEVEL_MIN_MB=0 forces it at test scale) still
    yields a working hierarchy: level-1 prefill attends level-0 through the
    views while level-1's own buffers ride the scan carry."""
    monkeypatch.setenv("HYDRAGEN_FILL_LEVEL_MIN_MB", "0")
    params = init_params(CFG, jax.random.PRNGKey(1))
    eng = HydragenLlama(CFG, params)
    eng.setup_caches(4, 16, [1, 2, 2], [24, 12, 8])
    rng = np.random.RandomState(1)
    eng.append_shared(rng.randint(1, 127, (1, 18)).astype(np.int32))
    eng.append_shared(rng.randint(1, 127, (2, 9)).astype(np.int32))
    out = eng.generate(
        input_ids=rng.randint(1, 127, (2, 4)).astype(np.int32),
        num_return_sequences=2, max_new_tokens=3, temperature=0.0,
    )
    assert out.shape == (4, 3)
    lv0, lv1 = eng.cache.shared[0], eng.cache.shared[1]
    assert int(lv0.seq_lens[0]) == 18
    assert list(np.asarray(lv1.seq_lens[:2])) == [9, 9]
    # Level buffers must hold real data where filled.
    assert np.abs(np.asarray(lv0.k[:, 0, :, :18])).sum() > 0
    assert np.abs(np.asarray(lv1.k[:, :2, :, :9])).sum() > 0
