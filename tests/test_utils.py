"""Unit tests for the benchmark-harness utilities (SURVEY.md C17-C19, C24)."""

import numpy as np

from hydragen_tpu.data.haystack import make_needle_haystack
from hydragen_tpu.utils import (
    SynthBenchmarkResult,
    dataclass_from_dict,
    dataclass_to_dict,
    load_yaml_dataclass,
    rdiff,
    save_yaml_dataclass,
    split_range,
)


def test_split_range_grammar():
    # Mirrors /root/reference/hydragen/benchmark_utils.py:207-229 semantics.
    assert split_range("1,2,5") == [1, 2, 5]
    assert split_range("8") == [8]
    assert split_range("1:4") == [1, 2, 3, 4]
    assert split_range("0:8:2") == [0, 2, 4, 6, 8]
    assert split_range("32:256:x2") == [32, 64, 128, 256]
    assert split_range("1:100:x10") == [1, 10, 100]


def test_rdiff():
    a = np.ones(4)
    assert rdiff(a, a) < 1e-12
    assert abs(rdiff(np.array([1.0]), np.array([3.0])) - 1.0) < 1e-9


def test_result_yaml_roundtrip(tmp_path):
    res = SynthBenchmarkResult(
        mode="hydragen", batch_size=4, num_shared=128, num_unique=16,
        model="test", times=[0.5, 0.5], warmup_times=[1.0],
    )
    d = dataclass_to_dict(res)
    assert d["mode"] == "hydragen"
    back = dataclass_from_dict(SynthBenchmarkResult, d)
    assert back == res
    assert back.throughput == 4 * 16 / 0.5

    path = tmp_path / "r.yaml"
    save_yaml_dataclass(res, path)
    assert load_yaml_dataclass(SynthBenchmarkResult, path) == res


def test_haystack_structure():
    doc, needles = make_needle_haystack(20_000, 8)
    assert len(needles) == 8
    assert abs(len(doc) - 20_000) < 5_000
    # Every needle sentence appears exactly once, at its recorded position.
    for n in needles:
        assert doc.count(n.sentence) == 1
        frac = doc.index(n.sentence) / len(doc)
        assert abs(frac - n.position_in_doc) < 0.05
        assert n.answer.lower() in n.sentence
    # Deterministic.
    doc2, needles2 = make_needle_haystack(20_000, 8)
    assert doc2 == doc and [n.question for n in needles2] == [
        n.question for n in needles
    ]


def test_haystack_synthetic_corpus(tmp_path):
    # Force the synthetic filler path (no corpus file).
    import hydragen_tpu.data.haystack as hs

    content = hs._synthetic_filler(30_000)
    assert len(content) >= 30_000
    assert "." in content
    p = tmp_path / "corpus.txt"
    p.write_text(content)
    doc, needles = make_needle_haystack(10_000, 4, corpus_path=str(p))
    assert all(doc.count(n.sentence) == 1 for n in needles)
