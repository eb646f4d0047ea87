"""Stop-sequence early termination (beyond-reference: README.md:486 lists
stop strings as unsupported in the reference; here stop TOKEN sequences are
matched host-side between decode chunks, sharing the EOS chunking path).

The untruncated greedy stream is itself asserted against the HF transformers
oracle (the CLAUDE.md e2e invariant), so these tests cannot pass on a
regressed model forward.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp, _finished_mask

VOCAB = 128
MAX_NEW = 16


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    return transformers.LlamaForCausalLM(config).eval()


@pytest.fixture(scope="module")
def prompt():
    return np.random.RandomState(0).randint(1, VOCAB, (1, 6)).astype(np.int32)


def _engine(hf_model, eos_chunk):
    eng = HydragenLlama.from_hf_model(hf_model, dtype="float32")
    eng.eos_chunk = eos_chunk
    eng.setup_caches(4, 32, [1], [8])
    return eng


def _gen(eng, prompt, **kw):
    return np.asarray(eng.generate(
        input_ids=[prompt], num_return_sequences=4, max_new_tokens=MAX_NEW,
        temperature=0.0, shared_cache_op=SharedCacheOp.WIPE, **kw,
    ))


@pytest.fixture(scope="module")
def full_stream(hf_model, prompt):
    """Untruncated greedy stream, HF-oracle-checked."""
    eng = _engine(hf_model, eos_chunk=4)
    full = _gen(eng, prompt)
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor(np.repeat(prompt, 4, axis=0)),
            max_new_tokens=MAX_NEW, do_sample=False,
        )
    ref_new = ref[:, prompt.shape[1]:].numpy()
    assert (full == ref_new).all(), "greedy stream diverged from HF oracle"
    return full


def _expected_keep(stream, eos, stops):
    """Independent (loop-based) restatement of the truncation semantics:
    keep up to the first column at which EVERY row has emitted eos or
    completed a stop sequence; the reference breaks before appending that
    last column (keep >= 1)."""
    b, T = stream.shape
    fin = np.zeros((b,), bool)
    for j in range(T):
        for i in range(b):
            if eos is not None and stream[i, j] == eos:
                fin[i] = True
            for s in stops or ():
                L = len(s)
                if j + 1 >= L and stream[i, j + 1 - L : j + 1].tolist() == list(s):
                    fin[i] = True
        if fin.all():
            return max(1, j)
    return T


def test_finished_mask_suffix_and_eos():
    toks = np.array([[5, 7, 9, 2, 1],
                     [7, 9, 1, 1, 1]], dtype=np.int32)
    fin = _finished_mask(toks, eos_token_id=2, stop_sequences=[[7, 9]])
    # Row 0: [7,9] completes at col 2; eos 2 at col 3.
    assert fin[0].tolist() == [False, False, True, True, True]
    # Row 1: [7,9] completes at col 1.
    assert fin[1].tolist() == [False, True, True, True, True]


def test_stop_sequence_truncates_like_eos(hf_model, prompt, full_stream):
    """A 1-token stop sequence must reproduce eos_token_id semantics, and
    ndarray-typed stop sequences must be accepted."""
    eng = _engine(hf_model, eos_chunk=4)
    tok = int(full_stream[0, 2])
    out_eos = _gen(eng, prompt, eos_token_id=tok)
    out_stop = _gen(eng, prompt, stop_sequences=np.array([[tok]]))
    assert out_eos.shape == out_stop.shape
    assert (out_eos == out_stop).all()
    assert out_eos.shape[1] == _expected_keep(full_stream, tok, ())


def test_multi_token_stop_spanning_chunks(hf_model, prompt, full_stream):
    """A 2-gram that STRADDLES an eos_chunk boundary (chunk=4: stream cols
    0..4 in chunk 1, so the gram at cols 4..5 spans into chunk 2) must be
    caught by the tail-carrying inter-chunk rematch and truncate where the
    independent loop-based oracle says."""
    gram = [int(full_stream[0, 4]), int(full_stream[0, 5])]
    eng = _engine(hf_model, eos_chunk=4)
    out = _gen(eng, prompt, stop_sequences=[gram])
    expect_keep = _expected_keep(full_stream, None, [gram])
    assert out.shape[1] == expect_keep, (out.shape, expect_keep, full_stream, gram)
    assert (out == full_stream[:, : out.shape[1]]).all()
