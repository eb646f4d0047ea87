"""Checkpoint round-trip: fp and int8-quantized param pytrees."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax

pytest.importorskip("orbax.checkpoint")

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    dtype="float32",
)


@pytest.mark.parametrize("quantized", [False, True])
def test_checkpoint_roundtrip(tmp_path, quantized):
    params = init_params(CFG, jax.random.PRNGKey(0), quantized=quantized)
    save_checkpoint(tmp_path / "ckpt", CFG, params)
    cfg2, params2 = load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == CFG

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The restored pytree must drive the engine identically.
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 128, (1, 6)).astype(np.int32)

    def run(p):
        eng = HydragenLlama(CFG, p)
        eng.setup_caches(2, 16, [1], [8])
        return np.asarray(eng.generate(
            input_ids=[prompt], num_return_sequences=2, max_new_tokens=5,
            temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
        ))

    np.testing.assert_array_equal(run(params), run(params2))
