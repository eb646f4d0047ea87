"""Tensor/data-parallel consistency on a virtual 8-device CPU mesh.

The reference has *no* distributed tests (SURVEY.md §4); this is the TPU
build's advantage: the same jitted engine runs SPMD over a forced-host-device
mesh, so sharded-vs-unsharded parity is a cheap CPU test.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces 8-device CPU platform)

import jax

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params
from hydragen_tpu.parallel import make_mesh, param_pspecs, shard_params

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def run_generate(engine):
    rng = np.random.RandomState(3)
    shared = rng.randint(1, 128, size=(1, 6)).astype(np.int32)
    suffix = rng.randint(1, 128, size=(4, 3)).astype(np.int32)
    engine.setup_caches(
        max_unique_batch_size=8,
        max_unique_seq_length=16,
        max_shared_batch_sizes=[1, 4],
        max_shared_seq_lengths=[8, 4],
    )
    toks, logits = engine.generate(
        input_ids=[shared, suffix],
        num_return_sequences=2,
        max_new_tokens=6,
        temperature=0.0,
        return_logits=True,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    return np.asarray(toks), [np.asarray(l) for l in logits]


@pytest.mark.parametrize("tp,dp,sp", [(2, 1, 1), (4, 2, 1), (1, 4, 1), (2, 2, 2)])
def test_sharded_matches_unsharded(params, tp, dp, sp):
    if jax.device_count() < tp * dp * sp:
        pytest.skip("not enough devices")
    base = HydragenLlama(CFG, params)
    t0, l0 = run_generate(base)

    mesh = make_mesh(tp=tp, dp=dp, sp=sp)
    sharded = HydragenLlama(CFG, params, mesh=mesh)
    t1, l1 = run_generate(sharded)

    np.testing.assert_array_equal(t0, t1)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_tp_exceeding_kv_heads_replicates(params):
    """tp=8 > num_kv_heads=4: kv projections/caches replicate, q stays
    sharded — a case the reference cannot express (tp.py:43-46)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    base = HydragenLlama(CFG, params)
    t0, l0 = run_generate(base)
    sharded = HydragenLlama(CFG, params, mesh=make_mesh(tp=8))
    t1, l1 = run_generate(sharded)
    np.testing.assert_array_equal(t0, t1)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_sharded_quantized_generate(params):
    """INT8 weights + (dp, tp) mesh end to end."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    base = HydragenLlama(CFG, params, quantization="int8")
    t0, l0 = run_generate(base)
    sharded = HydragenLlama(
        CFG, params, quantization="int8", mesh=make_mesh(tp=2, dp=2)
    )
    t1, l1 = run_generate(sharded)
    np.testing.assert_array_equal(t0, t1)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_param_sharding_layout():
    """Column/row-shard orientation matches the reference's apply_tp."""
    mesh = make_mesh(tp=4, dp=2)
    specs = param_pspecs(CFG, mesh)
    assert specs["layers"]["wq"] == jax.sharding.PartitionSpec(None, None, "tp")
    assert specs["layers"]["wo"] == jax.sharding.PartitionSpec(None, "tp", None)
    assert specs["layers"]["down"] == jax.sharding.PartitionSpec(None, "tp", None)

    p = init_params(CFG, jax.random.PRNGKey(1))
    sp = shard_params(p, CFG, mesh)
    # wq out-features sharded in 4 pieces
    shard_shapes = {s.data.shape for s in sp["layers"]["wq"].addressable_shards}
    L, H = CFG.num_hidden_layers, CFG.hidden_size
    assert shard_shapes == {(L, H, (CFG.num_attention_heads * CFG.head_dim) // 4)}
