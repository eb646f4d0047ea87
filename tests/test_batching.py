"""Continuous batching: admission/retirement correctness vs one-shot generate."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax

from hydragen_tpu.core.batching import ContinuousBatcher
from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    dtype="float32",
)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    shared = rng.randint(1, 128, (1, 8)).astype(np.int32)
    prompts = [rng.randint(1, 128, (n,)).astype(np.int32) for n in (3, 5, 2, 4, 6, 3)]
    return params, shared, prompts


def reference_tokens(params, shared, prompt, max_new):
    """One-shot engine.generate for a single request (the oracle)."""
    eng = HydragenLlama(CFG, params)
    eng.setup_caches(1, 32, [1], [16])
    eng.append_shared(shared)
    out = eng.generate(
        input_ids=[prompt[None]], max_new_tokens=max_new, temperature=0.0,
        shared_cache_op=SharedCacheOp.PRESERVE,
    )
    return np.asarray(out)[0].tolist()


def test_continuous_batching_matches_generate(setup):
    params, shared, prompts = setup
    max_new = 7

    # Pool of 2 rows, 6 requests: forces queueing, admission into freed rows,
    # and mixed-progress decoding.
    eng = HydragenLlama(CFG, params)
    eng.setup_caches(2, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=3, bucket=4, temperature=0.0)
    rids = [cb.submit(p, max_new_tokens=max_new) for p in prompts]
    results = cb.run()

    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        want = reference_tokens(params, shared, prompt, max_new)
        assert results[rid] == want, f"rid {rid}: {results[rid]} != {want}"


def test_continuous_batching_lpt_and_tail_shrink(setup):
    """LPT admission + tail-chunk shrinking are pure scheduling changes:
    every request's tokens must still match the one-shot oracle exactly.
    Mixed budgets force reordering; the large chunk vs small budgets forces
    the tail-shrink ladder."""
    params, shared, prompts = setup
    budgets = [3, 9, 2, 8, 4, 6]

    eng = HydragenLlama(CFG, params)
    eng.setup_caches(2, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=16, bucket=4, temperature=0.0,
                           admit_policy="lpt")
    rids = [cb.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    results = cb.run()

    assert set(results) == set(rids)
    for rid, prompt, b in zip(rids, prompts, budgets):
        want = reference_tokens(params, shared, prompt, b)
        assert results[rid] == want, f"rid {rid}: {results[rid]} != {want}"


def test_continuous_batching_eos(setup):
    params, shared, prompts = setup
    # Find the greedy continuation and use its 3rd token as eos.
    full = reference_tokens(params, shared, prompts[0], 8)
    eos = full[2]

    eng = HydragenLlama(CFG, params)
    eng.setup_caches(2, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=4, bucket=4, temperature=0.0, eos_token_id=eos)
    rid = cb.submit(prompts[0], max_new_tokens=8)
    results = cb.run()
    # Generation stops at (and includes) the eos token.
    assert results[rid] == full[:3]


def test_continuous_batching_quantized_kv_and_sampling(setup):
    """int8 KV cache + temperature sampling: plausible tokens, full budgets."""
    params, shared, prompts = setup
    eng = HydragenLlama(CFG, params, quantization="int8")
    eng.setup_caches(2, 32, [1], [16], kv_quant="int8")
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=3, bucket=4, temperature=0.9, seed=7)
    rids = [cb.submit(p, max_new_tokens=6) for p in prompts[:4]]
    results = cb.run()
    assert set(results) == set(rids)
    for rid in rids:
        toks = results[rid]
        assert len(toks) == 6
        assert all(0 <= t < CFG.vocab_size for t in toks)
    # Sampling across requests should not be identical everywhere.
    assert len({tuple(v) for v in results.values()}) > 1


def test_continuous_batching_varied_budgets(setup):
    params, shared, prompts = setup
    eng = HydragenLlama(CFG, params)
    eng.setup_caches(3, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=2, bucket=4, temperature=0.0)
    budgets = [1, 4, 9]
    rids = [cb.submit(p, max_new_tokens=n) for p, n in zip(prompts, budgets)]
    results = cb.run()
    for rid, prompt, n in zip(rids, prompts, budgets):
        want = reference_tokens(params, shared, prompt, n)
        assert results[rid] == want


def test_continuous_batching_int8_weights_inplace_path():
    """int8 weights route the ring decode through the in-place unrolled
    path (bf16 keeps the rolled scan); results must match the bf16-weight
    scheduler structurally (same budgets honored, tokens emitted)."""
    import jax

    from hydragen_tpu.core.batching import ContinuousBatcher
    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.llama import init_params

    params = init_params(CFG, jax.random.PRNGKey(0))
    eng = HydragenLlama(CFG, params, quantization="int8", prefill_bucket=0)
    eng.setup_caches(4, 32, [1], [16])
    rng = np.random.RandomState(11)
    eng.append_shared(rng.randint(1, CFG.vocab_size, size=(1, 8)).astype(np.int32))
    cb = ContinuousBatcher(eng, chunk=4, bucket=8)
    rids = [
        cb.submit(rng.randint(1, CFG.vocab_size, size=(5,)).astype(np.int32),
                  max_new_tokens=n)
        for n in (3, 7, 10)
    ]
    out = cb.run()
    assert [len(out[r]) for r in rids] == [3, 7, 10]


def test_continuous_batching_grouped_prefixes(setup):
    """sb > 1 pools: requests target a prefix group; each must decode under
    ITS group's shared stack (oracle: one-shot engine per prefix)."""
    params, _, prompts = setup
    rng = np.random.RandomState(9)
    shared2 = rng.randint(1, 128, (2, 8)).astype(np.int32)
    max_new = 6

    eng = HydragenLlama(CFG, params)
    eng.setup_caches(4, 32, [2], [16])
    eng.append_shared(shared2)
    cb = ContinuousBatcher(eng, chunk=3, bucket=4, temperature=0.0)
    rids = [
        cb.submit(p, max_new_tokens=max_new, group=i % 2)
        for i, p in enumerate(prompts)
    ]
    results = cb.run()

    assert set(results) == set(rids)
    for i, (rid, prompt) in enumerate(zip(rids, prompts)):
        want = reference_tokens(params, shared2[i % 2][None], prompt, max_new)
        assert results[rid] == want, f"rid {rid} (group {i % 2})"


def test_continuous_batching_stop_sequences(setup):
    """Per-request stop sequences retire rows early with exact tails, and
    the freed rows are re-admitted to queued requests."""
    params, shared, prompts = setup
    max_new = 10

    # Oracle streams (no stops) to pick a 2-gram per request.
    streams = [
        reference_tokens(params, shared, p, max_new) for p in prompts[:4]
    ]
    # Request 0 stops on the 2-gram at positions 2..3 of its own stream;
    # request 1 on a gram it never emits (runs to budget); 2 and 3 unstopped.
    gram0 = streams[0][2:4]
    never = [127, 126]

    eng = HydragenLlama(CFG, params)
    eng.setup_caches(2, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(eng, chunk=3, bucket=4, temperature=0.0)
    r0 = cb.submit(prompts[0], max_new_tokens=max_new, stop_sequences=[gram0])
    r1 = cb.submit(prompts[1], max_new_tokens=max_new, stop_sequences=[never])
    r2 = cb.submit(prompts[2], max_new_tokens=max_new)
    r3 = cb.submit(prompts[3], max_new_tokens=max_new)
    results = cb.run()

    # r0 ends exactly at the completed gram (greedy determinism).
    assert results[r0] == streams[0][:4], (results[r0], streams[0])
    assert results[r0][-2:] == gram0
    # r1 ignores the unmatched stop and runs its full budget.
    assert results[r1] == streams[1]
    assert results[r2] == streams[2]
    assert results[r3] == streams[3]


@pytest.mark.parametrize("lookahead", [2, 3])
def test_continuous_batching_deep_lookahead(setup, lookahead):
    """lookahead > 1 (round 5, VERDICT r4 weak #4's RTT experiment): the
    deeper dispatch pipeline must still produce exactly the one-shot
    oracle's tokens — retirement/admission merely lag extra chunks."""
    params, shared, prompts = setup
    max_new = 7
    eng = HydragenLlama(CFG, params)
    eng.setup_caches(2, 32, [1], [16])
    eng.append_shared(shared)
    cb = ContinuousBatcher(
        eng, chunk=3, bucket=4, temperature=0.0, lookahead=lookahead
    )
    rids = [cb.submit(p, max_new_tokens=max_new) for p in prompts]
    results = cb.run()
    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        want = reference_tokens(params, shared, prompt, max_new)
        assert results[rid] == want, f"rid {rid}: {results[rid]} != {want}"
