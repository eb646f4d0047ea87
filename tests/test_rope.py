"""RoPE scaling variants (linear / dynamic-NTK / llama3) vs the HF oracle."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp

VOCAB = 128


def make_hf(rope_scaling):
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_scaling=rope_scaling,
    )
    return transformers.LlamaForCausalLM(config).eval()


SCALINGS = [
    None,
    {"rope_type": "linear", "factor": 2.0},
    {
        "rope_type": "llama3", "factor": 4.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 64,
    },
]


@pytest.mark.parametrize("scaling", SCALINGS, ids=["none", "linear", "llama3"])
def test_rope_scaling_parity(scaling):
    hf = make_hf(scaling)
    engine = HydragenLlama.from_hf_model(hf, dtype="float32")
    if scaling is None:
        assert engine.config.rope_scaling is None
    else:
        assert engine.config.rope_scaling[0] == scaling["rope_type"]

    rng = np.random.RandomState(0)
    # Long enough prompt that scaled frequencies actually differ.
    prompt = rng.randint(1, VOCAB, size=(2, 90)).astype(np.int32)
    max_new = 6

    with torch.no_grad():
        out = hf.generate(
            torch.tensor(prompt), max_new_tokens=max_new, do_sample=False,
            pad_token_id=0,
        )
    ref_new = out[:, prompt.shape[1]:].numpy()

    engine.setup_caches(2, 128, [2], [96])
    got = engine.generate(
        input_ids=[prompt], max_new_tokens=max_new, temperature=0.0,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    np.testing.assert_array_equal(np.asarray(got), ref_new)
