"""Quickstart CLI: multi-level shared-prefix generation.

Counterpart of /root/reference/scripts/run.py:12-117. Prompts are given as
``|``-separated levels: ``--prompts "system prompt" "few|shot" "q1|q2|q3|q4"``
builds a 3-level hierarchy whose level sizes must divide the next level's.

Needs a local HF checkpoint+tokenizer (the environment is offline).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pretrained", help="HF model name or local path")
    p.add_argument("--prompts", nargs="+", required=True,
                   help="one string per level; '|' separates prompts in a level")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--num-return-sequences", type=int, default=1)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None,
                   choices=[None, "int8", "w8a8", "int4", "w4a8"],
                   help="weight quantization (host-side during conversion)")
    p.add_argument("--kv-quant", default=None,
                   choices=[None, "int8", "int4"], help="KV-cache precision")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    p.add_argument("--dp", type=int, default=1, help="data-parallel degree")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from transformers import AutoTokenizer

    from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp

    levels = [s.split("|") for s in args.prompts]
    for prev, cur in zip(levels, levels[1:]):
        assert len(cur) % len(prev) == 0, (
            f"level sizes must divide: {len(prev)} then {len(cur)}"
        )

    tok = AutoTokenizer.from_pretrained(args.pretrained)
    engine = HydragenLlama.from_pretrained(
        args.pretrained, dtype=args.dtype, quantization=args.quantization
    )
    if args.tp * args.dp > 1:
        from hydragen_tpu.parallel import make_mesh

        engine.shard(make_mesh(tp=args.tp, dp=args.dp))

    # Tokenize per level; BOS only at level 0 (run.py:59-73). Levels must be
    # rectangular; pad-free by construction here (equal-length enforced).
    ids = []
    for i, lvl in enumerate(levels):
        enc = [tok.encode(s, add_special_tokens=(i == 0)) for s in lvl]
        width = max(len(e) for e in enc)
        assert all(len(e) == width for e in enc), (
            "prompts within a level must tokenize to equal lengths "
            "(pass seq_lens via the library API for ragged levels)"
        )
        ids.append(np.asarray(enc, dtype=np.int32))

    final_bs = ids[-1].shape[0] * args.num_return_sequences
    engine.setup_caches(
        max_unique_batch_size=final_bs,
        max_unique_seq_length=ids[-1].shape[1] + args.max_new_tokens + 8,
        max_shared_batch_sizes=[a.shape[0] for a in ids],
        max_shared_seq_lengths=[a.shape[1] + 8 for a in ids],
        kv_quant=args.kv_quant,
    )
    out = engine.generate(
        input_ids=ids,
        num_return_sequences=args.num_return_sequences,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_p=args.top_p,
        eos_token_id=tok.eos_token_id,
        shared_cache_op=SharedCacheOp.WIPE,
        seed=args.seed,
    )
    for row in np.asarray(out):
        print("---")
        print(tok.decode(row, skip_special_tokens=True))


if __name__ == "__main__":
    main()
