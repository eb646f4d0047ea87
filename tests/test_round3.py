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


def test_shared_int8_unique_bf16():
    """The inverse mix (int8 shared / bf16 unique) also runs: the transcode
    dequantizes on copy."""
    eng = HydragenLlama(CFG, init_params(CFG, jax.random.PRNGKey(0)))
    eng.setup_caches(4, 64, [1], [16], kv_quant=None, shared_kv_quant="int8")
    assert not eng.cache.quantized and eng.cache.shared[0].quantized
    ref = _gen(_engine(None, "follow"), disable=True)
    out = _gen(eng, disable=True)
    assert (ref == out).all()
