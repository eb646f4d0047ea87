"""Needle-in-a-haystack long-context benchmark.

Counterpart of /root/reference/scripts/needles.py:51-251: prefill a long
haystack document ONCE into a shared cache level, then answer 2..N questions
batched as unique suffixes with ``shared_cache_op=PRESERVE`` — measuring
shared-prefill / unique-prefill / decode time and accuracy bucketed by needle
depth decile (a correctness canary at 16K+ context).

Needs a real instruction-following checkpoint for meaningful accuracy; with
``--preset`` + random weights it still measures speed (accuracy ~= chance).
"""

from __future__ import annotations

import argparse
import re
import time
from pathlib import Path

import numpy as np

from hydragen_tpu.data.haystack import make_needle_haystack
from hydragen_tpu.utils import NeedlesBenchmarkResult, save_yaml_dataclass, split_range

PROMPT_TEMPLATE = (
    "Answer the question using the document above. "
    "Reply with just the answer between ###answer### markers.\n"
    "Question: {question}\nAnswer: ###"
)

ANSWER_RE = re.compile(r"###\s*(?:answer\s*###\s*)?([A-Za-z]+)")


def extract_answer(text: str):
    """Pull the one-word answer out of '###answer### Blue ...'-style output
    (needles.py:24-41)."""
    m = ANSWER_RE.search(text)
    return m.group(1).strip().lower() if m else None


def score_answers(texts, needles):
    """Score decoded answers against their needles, bucketed by depth decile.

    texts: decoded model outputs, question ``i`` asked about needle
    ``i % len(needles)`` (the protocol's question order). Returns
    (num_correct, correct_by_decile, count_by_decile) with deciles from each
    needle's fractional position in the document (needles.py:223-247).
    """
    correct_by_dec = [0] * 10
    count_by_dec = [0] * 10
    num_correct = 0
    for i, text in enumerate(texts):
        needle = needles[i % len(needles)]
        got = extract_answer("###" + text)
        dec = min(int((needle.position_in_doc or 0.0) * 10), 9)
        count_by_dec[dec] += 1
        if got == needle.answer.lower():
            correct_by_dec[dec] += 1
            num_correct += 1
    return num_correct, correct_by_dec, count_by_dec


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("outdir", type=Path)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--preset", default="yi-6b-200k")
    p.add_argument("--haystack-chars", type=int, default=50_000)
    p.add_argument("--num-needles", type=int, default=64)
    p.add_argument("--num-questions", default="2:64:x2")
    p.add_argument("--max-new-tokens", type=int, default=12)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None, choices=[None, "int8", "w8a8", "int4", "w4a8"])
    p.add_argument("--kv-quant", default=None, choices=[None, "int8", "int4"])
    p.add_argument("--corpus", default=None, help="filler text file")
    p.add_argument("--tp", type=int, default=1)
    args = p.parse_args()

    import jax

    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
    from hydragen_tpu.models.config import PRESETS
    from hydragen_tpu.models.llama import init_params
    from hydragen_tpu.utils.timing import _fence

    doc, needles = make_needle_haystack(
        args.haystack_chars, args.num_needles, corpus_path=args.corpus
    )

    tok = None
    if args.pretrained:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.pretrained)
        engine = HydragenLlama.from_pretrained(
            args.pretrained, dtype=args.dtype, quantization=args.quantization
        )
        doc_ids = np.asarray([tok.encode(doc)], dtype=np.int32)
    else:
        cfg = PRESETS[args.preset]
        engine = HydragenLlama(
            cfg,
            init_params(cfg, jax.random.PRNGKey(0),
                        quantized=args.quantization or False),
            quantization=args.quantization,
        )
        # ~4 chars/token synthetic tokenization for speed-only runs.
        rng = np.random.RandomState(0)
        doc_ids = rng.randint(
            1, engine.config.vocab_size, size=(1, args.haystack_chars // 4)
        ).astype(np.int32)
    if args.tp > 1:
        from hydragen_tpu.parallel import make_mesh

        engine.shard(make_mesh(tp=args.tp))

    args.outdir.mkdir(parents=True, exist_ok=True)
    q_counts = split_range(args.num_questions)
    max_q = max(q_counts)

    # Tokenize all questions (equal length via left-padding the template? —
    # right-pad + seq_lens keeps positions correct).
    def question_ids(n):
        qs = [PROMPT_TEMPLATE.format(question=needles[i % len(needles)].question)
              for i in range(n)]
        if tok is not None:
            enc = [tok.encode(q, add_special_tokens=False) for q in qs]
        else:
            rng = np.random.RandomState(1)
            enc = [rng.randint(1, engine.config.vocab_size, size=(24,)).tolist()
                   for _ in qs]
        width = max(len(e) for e in enc)
        arr = np.zeros((n, width), dtype=np.int32)
        lens = np.zeros((n,), dtype=np.int32)
        for i, e in enumerate(enc):
            arr[i, : len(e)] = e
            lens[i] = len(e)
        return arr, lens

    q_arr_max, _ = question_ids(max_q)
    engine.setup_caches(
        max_unique_batch_size=max_q,
        max_unique_seq_length=q_arr_max.shape[1] + args.max_new_tokens + 8,
        max_shared_batch_sizes=[1],
        max_shared_seq_lengths=[doc_ids.shape[1] + 8],
        kv_quant=args.kv_quant,
    )

    # Shared prefill ONCE (needles.py:151).
    t0 = time.perf_counter()
    _fence(engine.append_shared(doc_ids))
    shared_prefill_time = time.perf_counter() - t0
    print(f"shared prefill ({doc_ids.shape[1]} tok): {shared_prefill_time:.2f}s")

    for n in q_counts:
        path = args.outdir / f"needles_q{n}.yaml"
        if path.exists():
            print(f"skip (exists): {path}")
            continue
        arr, lens = question_ids(n)

        def gen():
            return engine.generate(
                input_ids=[arr],
                seq_lens=[lens],
                max_new_tokens=args.max_new_tokens,
                temperature=0.0,
                shared_cache_op=SharedCacheOp.PRESERVE,
            )

        _fence(gen())  # compile + warm (XLA's CUDA-graph-capture analogue)
        t0 = time.perf_counter()
        out = gen()
        out = np.asarray(out)
        decode_time = time.perf_counter() - t0

        correct_by_dec = [0] * 10
        count_by_dec = [0] * 10
        num_correct = 0
        if tok is not None:
            texts = [tok.decode(out[i], skip_special_tokens=True) for i in range(n)]
            num_correct, correct_by_dec, count_by_dec = score_answers(texts, needles)
        res = NeedlesBenchmarkResult(
            num_questions=n,
            haystack_chars=args.haystack_chars,
            num_correct=num_correct,
            accuracy_by_decile=[
                (c / t if t else 0.0) for c, t in zip(correct_by_dec, count_by_dec)
            ],
            counts_by_decile=count_by_dec,
            shared_prefill_time=shared_prefill_time,
            decode_times=[decode_time],
        )
        tput = n * args.max_new_tokens / decode_time
        print(f"q={n}: {decode_time:.2f}s ({tput:.0f} tok/s), acc={res.accuracy:.2f}")
        save_yaml_dataclass(res, path)


if __name__ == "__main__":
    main()
