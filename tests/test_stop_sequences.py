"""Stop-sequence early termination (beyond-reference: README.md:486 lists
stop strings as unsupported in the reference; here stop TOKEN sequences are
matched host-side between decode chunks, sharing the EOS chunking path)."""

import numpy as np

import tests.conftest  # noqa: F401

import jax

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp, _finished_mask
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import init_params

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    dtype="float32",
)


def _engine(eos_chunk=4):
    eng = HydragenLlama(CFG, init_params(CFG, jax.random.PRNGKey(0)),
                        eos_chunk=eos_chunk)
    eng.setup_caches(4, 32, [1], [8])
    return eng


def _gen(eng, **kw):
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 128, (1, 6)).astype(np.int32)
    return np.asarray(eng.generate(
        input_ids=[prompt], num_return_sequences=4, max_new_tokens=16,
        temperature=0.0, shared_cache_op=SharedCacheOp.WIPE, **kw,
    ))


def test_finished_mask_suffix_and_eos():
    toks = np.array([[5, 7, 9, 2, 1],
                     [7, 9, 1, 1, 1]], dtype=np.int32)
    fin = _finished_mask(toks, eos_token_id=2, stop_sequences=[[7, 9]])
    # Row 0: [7,9] completes at col 2; eos 2 at col 3.
    assert fin[0].tolist() == [False, False, True, True, True]
    # Row 1: [7,9] completes at col 1.
    assert fin[1].tolist() == [False, True, True, True, True]


def test_stop_sequence_truncates_like_eos():
    """A 1-token stop sequence must reproduce eos_token_id semantics."""
    eng = _engine()
    full = _gen(eng)
    tok = int(full[0, 2])  # a token every row has? use row-0's 3rd token
    out_eos = _gen(eng, eos_token_id=tok)
    out_stop = _gen(eng, stop_sequences=[[tok]])
    assert out_eos.shape == out_stop.shape
    assert (out_eos == out_stop).all()


def test_multi_token_stop_spanning_chunks():
    """A 2-gram taken from the greedy stream must truncate generation at
    the column where the last row completes it — including when the 2-gram
    spans an eos_chunk boundary (chunk=4; pick the gram at cols 3..4)."""
    eng = _engine(eos_chunk=4)
    full = _gen(eng)
    assert full.shape == (4, 16)
    gram = [int(full[0, 3]), int(full[0, 4])]
    out = _gen(eng, stop_sequences=[gram])
    # Greedy is deterministic: out is a prefix of full, truncated at the
    # first column where EVERY row has completed some occurrence of gram.
    fin = _finished_mask(full, None, [gram])
    all_done = fin.all(axis=0)
    expect_keep = 16 if not all_done.any() else max(1, int(np.argmax(all_done)))
    assert out.shape[1] == expect_keep, (out.shape, expect_keep, full, gram)
    assert (out == full[:, : out.shape[1]]).all()
