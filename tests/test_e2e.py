"""End-to-end model parity vs HuggingFace transformers.

Mirrors the reference's e2e tier (/root/reference/tests/test_e2e.py): run the
same prompts through a HF Llama (the oracle) and through HydragenLlama with
``token_overrides`` forcing the HF-greedy token path, then compare per-step
logits — asserting logits close rather than token equality so numerical
drift can't cascade (the reference's key device, test_e2e.py:110-119).

The oracle here is a tiny *randomly initialized* HF model built from a config
(no downloads — CI is offline), exercised in float32 on CPU, which makes the
tolerances much tighter than the reference's fp16 GPU bounds.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU platform before jax import)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp


VOCAB = 128


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(config)
    model.eval()
    return model


@pytest.fixture(scope="module")
def engine(hf_model):
    return HydragenLlama.from_hf_model(hf_model, dtype="float32")


def hf_reference_generate(hf_model, full_input_ids, max_new_tokens):
    """HF greedy generation returning (new_ids [b, n], per-step logits)."""
    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor(np.asarray(full_input_ids)),
            max_new_tokens=max_new_tokens,
            do_sample=False,
            output_scores=True,
            return_dict_in_generate=True,
            pad_token_id=0,
        )
    new_ids = out.sequences[:, full_input_ids.shape[1]:].numpy()
    scores = [s.numpy() for s in out.scores]  # list of [b, V]
    return new_ids, scores


def repeat_rows(x, factor):
    return np.repeat(np.asarray(x), factor, axis=0)


def mean_rdiff(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return (2 * np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-9)).mean()


CACHE_TOPOLOGIES = [
    # (level token lengths, level batch sizes, suffix batch, nrs)
    ([6], [1], 1, 1),          # one shared prompt (implicit), single completion
    ([6], [1], 2, 1),          # shared + 2 unique suffixes
    ([6, 4], [1, 2], 2, 1),    # two shared levels + suffixes
    ([6], [1], 1, 2),          # nrs>1: all levels shared
    ([6, 4], [1, 2], 2, 2),    # hierarchy + nrs>1
]


@pytest.mark.parametrize("topology", CACHE_TOPOLOGIES, ids=[str(i) for i in range(len(CACHE_TOPOLOGIES))])
def test_generate_logit_parity(hf_model, engine, topology):
    level_lens, level_bs, suffix_bs, nrs = topology
    max_new = 8
    rng = np.random.RandomState(42)

    # Build the level id tensors + a suffix level.
    ids = []
    for ln, bs in zip(level_lens, level_bs):
        ids.append(rng.randint(1, VOCAB, size=(bs, ln)).astype(np.int32))
    suffix = rng.randint(1, VOCAB, size=(suffix_bs, 3)).astype(np.int32)
    ids.append(suffix)

    total_bs = suffix_bs * nrs

    # HF oracle: concatenate each sequence's full prompt.
    full = []
    for row in range(suffix_bs):
        parts = []
        for lvl, arr in enumerate(ids):
            j = row // (suffix_bs // arr.shape[0])
            parts.append(arr[j])
        full.append(np.concatenate(parts))
    full = np.stack(full)
    full = repeat_rows(full, nrs)
    ref_new_ids, ref_scores = hf_reference_generate(hf_model, full, max_new)

    # Hydragen path with token overrides following the HF tokens.
    engine.setup_caches(
        max_unique_batch_size=total_bs,
        max_unique_seq_length=suffix.shape[1] + max_new + 2,
        max_shared_batch_sizes=[a.shape[0] for a in ids] + [total_bs],
        max_shared_seq_lengths=[a.shape[1] + 1 for a in ids] + [4],
    )
    tokens, logits = engine.generate(
        input_ids=ids,
        num_return_sequences=nrs,
        max_new_tokens=max_new,
        temperature=0.0,
        return_logits=True,
        shared_cache_op=SharedCacheOp.WIPE,
        token_overrides=repeat_rows(ref_new_ids, 1) if nrs == 1 else ref_new_ids,
    )

    assert len(logits) == max_new
    for step in range(max_new):
        got = np.asarray(logits[step])
        want = ref_scores[step]
        assert got.shape == want.shape
        rd = mean_rdiff(got, want)
        assert rd < 5e-3, f"step {step}: mean rdiff {rd}"
        np.testing.assert_allclose(got, want, atol=2e-3)

    # Greedy tokens should also agree in fp32.
    np.testing.assert_array_equal(np.asarray(tokens), ref_new_ids)


def test_disable_hydragen_consistency(hf_model, engine):
    """hydragen-on vs hydragen-off logits agree (test_e2e.py:122-210)."""
    rng = np.random.RandomState(7)
    shared = rng.randint(1, VOCAB, size=(1, 6)).astype(np.int32)
    suffix = rng.randint(1, VOCAB, size=(2, 3)).astype(np.int32)
    max_new = 6

    def run(disable):
        engine.setup_caches(
            max_unique_batch_size=2,
            max_unique_seq_length=6 + 3 + max_new + 2,
            max_shared_batch_sizes=[1],
            max_shared_seq_lengths=[8],
        )
        return engine.generate(
            input_ids=[shared, suffix],
            max_new_tokens=max_new,
            temperature=0.0,
            return_logits=True,
            shared_cache_op=SharedCacheOp.WIPE,
            disable_hydragen=disable,
        )

    tok_on, log_on = run(False)
    tok_off, log_off = run(True)
    np.testing.assert_array_equal(np.asarray(tok_on), np.asarray(tok_off))
    for a, b in zip(log_on, log_off):
        assert mean_rdiff(a, b) < 2e-2


def test_disable_hierarchy_consistency(hf_model, engine):
    """hierarchy-on vs flattened-to-one-level agree (test_e2e.py:213-298)."""
    rng = np.random.RandomState(8)
    shared = rng.randint(1, VOCAB, size=(1, 5)).astype(np.int32)
    suffix = rng.randint(1, VOCAB, size=(2, 3)).astype(np.int32)
    nrs, max_new = 2, 6

    def run(disable_hierarchy):
        engine.setup_caches(
            max_unique_batch_size=4,
            max_unique_seq_length=16 + max_new,
            max_shared_batch_sizes=[1, 2, 4],
            max_shared_seq_lengths=[8, 8, 4],
        )
        return engine.generate(
            input_ids=[shared, suffix],
            num_return_sequences=nrs,
            max_new_tokens=max_new,
            temperature=0.0,
            return_logits=True,
            shared_cache_op=SharedCacheOp.WIPE,
            disable_hierarchy=disable_hierarchy,
        )

    tok_on, log_on = run(False)
    tok_off, log_off = run(True)
    np.testing.assert_array_equal(np.asarray(tok_on), np.asarray(tok_off))
    for a, b in zip(log_on, log_off):
        assert mean_rdiff(a, b) < 2e-2


def test_shared_cache_preserve_and_extend(hf_model, engine):
    """shared_cache_op semantics (llama.py:869-872, 1384-1385)."""
    rng = np.random.RandomState(9)
    shared = rng.randint(1, VOCAB, size=(1, 6)).astype(np.int32)
    suffix = rng.randint(1, VOCAB, size=(2, 3)).astype(np.int32)

    engine.setup_caches(
        max_unique_batch_size=2,
        max_unique_seq_length=32,
        max_shared_batch_sizes=[1, 2],
        max_shared_seq_lengths=[8, 8],
    )
    # Prefill the shared level once, preserve across generate calls.
    engine.append_shared(shared)
    assert engine.get_num_used_shared_caches() == 1

    out1 = engine.generate(
        input_ids=[suffix], max_new_tokens=4, temperature=0.0,
        shared_cache_op=SharedCacheOp.PRESERVE,
    )
    assert engine.get_num_used_shared_caches() == 1
    out2 = engine.generate(
        input_ids=[suffix], max_new_tokens=4, temperature=0.0,
        shared_cache_op=SharedCacheOp.PRESERVE,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # Oracle: the same full prompts through HF.
    full = np.concatenate([repeat_rows(shared, 2), suffix], axis=1)
    ref_new, _ = hf_reference_generate(hf_model, full, 4)
    np.testing.assert_array_equal(np.asarray(out1), ref_new)


def test_shared_cache_extend_resume(hf_model, engine):
    """shared_cache_op=EXTEND keeps the prompt levels pushed during generate,
    enabling the starting_logits resume flow (reference README.md:189-244,
    llama.py:869-872,1287-1295)."""
    rng = np.random.RandomState(14)
    prompt = rng.randint(1, VOCAB, size=(1, 5)).astype(np.int32)
    engine.setup_caches(
        max_unique_batch_size=2,
        max_unique_seq_length=32,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[8],
    )
    engine.empty_shared_cache()
    # First call: nrs>1 makes the prompt a shared level; EXTEND keeps it.
    out1, logits1 = engine.generate(
        input_ids=[prompt], num_return_sequences=2, max_new_tokens=4,
        temperature=0.0, return_logits=True,
        shared_cache_op=SharedCacheOp.EXTEND,
    )
    assert engine.get_num_used_shared_caches() == 1
    # Later batches resume from the stored prefill logits, never
    # re-processing the prompt (reference README.md:203-238).
    out2 = engine.generate(
        starting_logits=np.asarray(logits1[0][0:1]),
        num_return_sequences=2, max_new_tokens=4, temperature=0.0,
        shared_cache_op=SharedCacheOp.PRESERVE,
    )
    assert engine.get_num_used_shared_caches() == 1
    ref_new, _ = hf_reference_generate(hf_model, prompt, 4)
    for out in (out1, out2):  # greedy: every row follows the HF path
        for row in np.asarray(out):
            np.testing.assert_array_equal(row[None], ref_new)
    engine.empty_shared_cache()


def test_starting_logits_resume(hf_model, engine):
    """generate(starting_logits=...) resumes without re-prefill
    (llama.py:1287-1295)."""
    rng = np.random.RandomState(10)
    prompt = rng.randint(1, VOCAB, size=(2, 5)).astype(np.int32)
    max_new = 5

    engine.setup_caches(
        max_unique_batch_size=2,
        max_unique_seq_length=32,
        max_shared_batch_sizes=[2],
        max_shared_seq_lengths=[8],
    )
    engine.empty_shared_cache()
    logits = engine.append_shared(prompt)

    out = engine.generate(
        starting_logits=np.asarray(logits[:, -1]),
        max_new_tokens=max_new,
        temperature=0.0,
        shared_cache_op=SharedCacheOp.PRESERVE,
    )
    ref_new, _ = hf_reference_generate(hf_model, prompt, max_new)
    np.testing.assert_array_equal(np.asarray(out), ref_new)


def test_ragged_suffix_lens(hf_model, engine):
    """Right-padded ragged suffixes + per-row seq_lens: greedy parity row by
    row vs HF (exercises the padded unique-prefill path and the per-row
    scatter decode path)."""
    rng = np.random.RandomState(12)
    shared = rng.randint(1, VOCAB, size=(1, 6)).astype(np.int32)
    lens = np.array([2, 4, 3], dtype=np.int32)
    width = int(lens.max())
    suffix = np.zeros((3, width), dtype=np.int32)
    rows = [rng.randint(1, VOCAB, size=(l,)).astype(np.int32) for l in lens]
    for i, r in enumerate(rows):
        suffix[i, : len(r)] = r

    max_new = 6
    engine.setup_caches(
        max_unique_batch_size=3,
        max_unique_seq_length=width + max_new + 2,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[8],
    )
    out = engine.generate(
        input_ids=[shared, suffix],
        seq_lens=[None, lens],
        max_new_tokens=max_new,
        temperature=0.0,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    out = np.asarray(out)
    for i, r in enumerate(rows):
        full = np.concatenate([shared[0], r])[None, :]
        ref_new, _ = hf_reference_generate(hf_model, full, max_new)
        np.testing.assert_array_equal(out[i : i + 1], ref_new)


def test_eos_early_stop(hf_model, engine):
    rng = np.random.RandomState(11)
    prompt = rng.randint(1, VOCAB, size=(1, 4)).astype(np.int32)
    engine.setup_caches(
        max_unique_batch_size=1,
        max_unique_seq_length=32,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[8],
    )
    full = engine.generate(
        input_ids=[prompt], max_new_tokens=8, temperature=0.0,
        shared_cache_op=SharedCacheOp.WIPE,
    )
    eos = int(np.asarray(full)[0, 2])
    stopped = engine.generate(
        input_ids=[prompt], max_new_tokens=8, temperature=0.0,
        eos_token_id=eos, shared_cache_op=SharedCacheOp.WIPE,
    )
    # Greedy tokens match the untruncated run, cut at the step where all
    # sequences have produced eos — that step's token is not appended
    # (reference breaks before the append, llama.py:1367-1375), so with eos
    # at index 2 the output keeps indices [0, 1].
    assert stopped.shape[1] == 2
    np.testing.assert_array_equal(np.asarray(stopped), np.asarray(full)[:, :2])
