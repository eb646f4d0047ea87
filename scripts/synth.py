"""Synthetic end-to-end benchmark sweep.

Counterpart of /root/reference/scripts/synth.py:36-255: sweep
batch-size × shared-prefix-length × new-tokens over modes
{hydragen, hydragen_noshared, noattention}, one YAML per config
(crash-resumable: existing files are skipped). "hydragen_noshared" is the
plain-flash-attention baseline (disable_hydragen), "noattention" the
attention-free throughput upper bound (disable_attention).

Runs with random weights by default (timing does not depend on weight
values); pass --pretrained for a real checkpoint.
"""

from __future__ import annotations

import argparse
import itertools
from pathlib import Path

import numpy as np

from hydragen_tpu.utils import (
    SynthBenchmarkResult,
    save_yaml_dataclass,
    split_range,
    timed,
)

MODES = ("hydragen", "hydragen_noshared", "noattention", "hydragen_nohierarchy")



def fits_hbm(cfg, quant, kv_quant, bs, ns, nu, mode, levels,
             shared_int8=None, level2_bs=0) -> bool:
    """Pre-flight HBM estimate so paper-shape grids can include points the
    chip cannot host (the reference's noshared mode OOMs the same way at
    paper scale, synth.py:82-115) — they are skipped with a note instead of
    crashing the sweep. Only binding on the real TPU. ``quant`` is the
    quantization mode string (None/int8/w8a8/int4/w4a8)."""
    import jax

    from hydragen_tpu.utils.capacity import HBM_BYTES, param_bytes

    if jax.default_backend() != "tpu":
        return True
    L = cfg.num_hidden_layers
    weights = param_bytes(cfg, quant)
    per_tok = cfg.num_key_value_heads * cfg.head_dim * 2
    itemsize = {None: 2, "int8": 1, "int4": 0.5}[kv_quant]
    if shared_int8 is None:
        shared_int8 = kv_quant is not None
    s_itemsize = 1 if shared_int8 else 2
    unique_len = nu + 8 + (ns if mode == "hydragen_noshared" else 0)
    # Level-1 sub-prompts live in a SHARED level (stored once per prefix),
    # except in the nohierarchy ablation where they flatten into each
    # row's unique suffix — mirror bench_point exactly: the r5 hier_big
    # arm was skipped by an estimate that charged level-1 per row for
    # every mode AND double-counted it.
    l2_len = max(16, ns // 8) if levels == 2 else 0
    l2 = (level2_bs or max(1, int(bs ** 0.5))) if levels == 2 else 0
    if mode == "hydragen_nohierarchy":
        unique_len += l2_len
    # Unique tokens at kv precision; shared tokens at the (possibly
    # different) --shared-kv precision — mispricing here defeats the
    # pre-flight and the sweep crashes mid-run.
    u_tokens = bs * unique_len
    shared_tokens = ns + l2 * l2_len
    cache = int(L * u_tokens * per_tok * itemsize) \
        + L * shared_tokens * per_tok * s_itemsize
    if kv_quant is not None:
        cache += L * u_tokens * cfg.num_key_value_heads * 2 * 4  # f32 scales
    if shared_int8:
        cache += L * shared_tokens * cfg.num_key_value_heads * 2 * 4
    transient = 0
    if mode == "hydragen_noshared":  # copy_shared_to_unique's repeat
        transient = L * bs * ns * per_tok * itemsize
    # Shared-prefill new-KV transient: ONE layer's worth. The fill_level
    # scan (model_forward) writes each layer's KV straight into the level
    # buffers inside the carry, so the stacked [L, ...] array — a full
    # second copy of the level beside the destination (4.4 GB at 7B/16K
    # int8) that kept every 16K x 7B cell "exceeds HBM" through round 5 —
    # never exists.
    sp_item = (1 + 4 / cfg.head_dim) if shared_int8 else 2
    transient = max(transient, int(ns * per_tok * sp_item))
    if mode == "hydragen_noshared":
        # int4 emits UNPACKED int8 values in-scan (packing happens at the
        # cache write), so the transient is 1 byte/value for any kv_quant.
        up_item = (1 + 4 / cfg.head_dim) if kv_quant else 2
        transient = max(
            transient,
            int(L * bs * (ns + nu) * per_tok * up_item)
            + L * bs * ns * per_tok * itemsize,  # repeat copy coexists
        )
    # Prefill activation slack (hidden/intermediate rows at ns width).
    act = 6 * ns * max(cfg.intermediate_size, cfg.hidden_size) * 2
    return weights + cache + transient + act < HBM_BYTES


def result_path(outdir: Path, mode: str, bs: int, ns: int, nu: int) -> Path:
    return outdir / f"{mode}_bs{bs}_ns{ns}_nu{nu}.yaml"


def bench_point(engine, mode: str, bs: int, ns: int, nu: int, iters: int,
                vocab: int, measure_prefill: bool, levels: int = 1,
                level2_bs: int = 0, kv_quant=None, shared_kv_quant="follow"):
    from hydragen_tpu.core.engine import SharedCacheOp

    rng = np.random.RandomState(0)
    prompt = rng.randint(1, vocab, size=(1, ns)).astype(np.int32)
    unique_len = nu + 8 + (ns if mode == "hydragen_noshared" else 0)
    if mode == "hydragen_nohierarchy":
        assert levels == 2, "nohierarchy ablation needs --levels 2"
        unique_len += max(16, ns // 8)  # the flattened level-1 prompt
    if levels == 2:
        # Two-level hierarchy (paper §4.4, AlphaCode-style): level 0 = one
        # shared prompt, level 1 = level2_bs distinct sub-prompts, bs/level2_bs
        # completions each.
        l2 = level2_bs or max(1, int(bs ** 0.5))
        assert bs % l2 == 0
        prompt2 = rng.randint(1, vocab, size=(l2, max(16, ns // 8))).astype(np.int32)
        inputs = [prompt, prompt2]
        shared_bs, shared_len = [1, l2], [ns, prompt2.shape[1]]
    else:
        inputs = [prompt]
        shared_bs, shared_len = [1], [ns]
    engine.cache = None  # free the previous config's buffers BEFORE allocating
    engine.setup_caches(
        max_unique_batch_size=bs,
        max_unique_seq_length=unique_len,
        max_shared_batch_sizes=shared_bs,
        max_shared_seq_lengths=shared_len,
        kv_quant=kv_quant,
        shared_kv_quant=shared_kv_quant,
    )

    def gen(max_new=nu):
        return engine.generate(
            input_ids=inputs,
            num_return_sequences=bs // (inputs[-1].shape[0]),
            max_new_tokens=max_new,
            temperature=0.0,
            shared_cache_op=SharedCacheOp.WIPE,
            disable_hydragen=(mode == "hydragen_noshared"),
            disable_attention=(mode == "noattention"),
            disable_hierarchy=(mode == "hydragen_nohierarchy"),
        )

    times, warmup = timed(gen, num_iters=iters, num_warmup=2)
    prefill_times = []
    if measure_prefill:  # separate prefill series via a 1-token run (synth.py:217-226)
        prefill_times, _ = timed(lambda: gen(1), num_iters=iters, num_warmup=1)
    return times, warmup, prefill_times


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("outdir", type=Path)
    p.add_argument("--bs", default="32", help="sweep range, e.g. 32:1024:x2")
    p.add_argument("--num-shared", default="1024", help="shared prefix length range")
    p.add_argument("--num-unique", default="64", help="new tokens per sequence range")
    p.add_argument("--mode", default="hydragen", choices=MODES + ("all",))
    p.add_argument("--levels", type=int, default=1, choices=(1, 2),
                   help="2 = two-level hierarchy (paper §4.4)")
    p.add_argument("--level2-bs", type=int, default=0,
                   help="level-1 prefix count (default sqrt(bs))")
    p.add_argument("--preset", default="sheared-llama-1.3b")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None,
               choices=[None, "int8", "w8a8", "int4", "w4a8"])
    p.add_argument("--kv-quant", default=None, choices=[None, "int8", "int4"],
                   help="int8 KV cache (halves KV HBM; enables paper-scale bs)")
    p.add_argument("--shared-kv", default="follow",
                   choices=("follow", "none", "int8"),
                   help="shared-level KV precision (none = compute dtype; "
                   "the prefix is stored once, so bf16 costs little HBM and "
                   "skips the dequant VPU pass at every read)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--impl", default=None,
                   choices=(None, "auto", "xla", "pallas"),
                   help="attention impl override (engine default: auto)")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--measure-prefill", action="store_true")
    args = p.parse_args()

    import jax

    # Sweep configs recompile identically between (resumed) runs; the
    # persistent cache cuts repeat wall-clock from minutes to seconds.
    from hydragen_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # TPU only (foreign-host CPU AOT can SIGILL)

    from hydragen_tpu.core.engine import HydragenLlama
    from hydragen_tpu.models.config import PRESETS
    from hydragen_tpu.models.llama import init_params

    if args.pretrained:
        engine = HydragenLlama.from_pretrained(
            args.pretrained, dtype=args.dtype, quantization=args.quantization,
            impl=args.impl,
        )
        model_name = args.pretrained
    else:
        cfg = PRESETS[args.preset]
        if cfg.dtype != args.dtype:
            import dataclasses

            cfg = dataclasses.replace(cfg, dtype=args.dtype)
        engine = HydragenLlama(
            cfg,
            init_params(cfg, __import__("jax").random.PRNGKey(0),
                        quantized=args.quantization or False),
            quantization=args.quantization,
            impl=args.impl,
        )
        model_name = args.preset
    if args.tp * args.dp > 1:
        from hydragen_tpu.parallel import make_mesh

        engine.shard(make_mesh(tp=args.tp, dp=args.dp))

    if args.mode == "all":
        # disable_hydragen (noshared) only supports the flat 2-level layout;
        # hierarchical sweeps compare hydragen vs the nohierarchy ablation
        # (reference docs/sweeps_from_paper.md hierarchical runs).
        if args.levels == 2:
            modes = ("hydragen", "noattention", "hydragen_nohierarchy")
        else:
            modes = MODES[:3]
    else:
        modes = (args.mode,)
    args.outdir.mkdir(parents=True, exist_ok=True)
    grid = list(itertools.product(
        split_range(args.bs), split_range(args.num_shared), split_range(args.num_unique)
    ))
    for bs, ns, nu in grid:
        for mode in modes:
            path = result_path(args.outdir, mode, bs, ns, nu)
            if path.exists():
                print(f"skip (exists): {path}")
                continue
            if mode == "hydragen_noshared" and args.kv_quant == "int4":
                # The baseline's copied prefix cannot live in the int4
                # token-planar pack (engine raises); protocol comparisons
                # run the baseline at int8 instead.
                print(f"skip (noshared unsupported with kv int4): bs={bs}")
                continue
            if not fits_hbm(engine.config, args.quantization,
                            args.kv_quant, bs, ns, nu, mode,
                            args.levels, level2_bs=args.level2_bs,
                            shared_int8={"follow": args.kv_quant is not None,
                                         "int8": True,
                                         "none": False}[args.shared_kv]):
                print(f"skip (exceeds HBM): mode={mode} bs={bs} ns={ns} nu={nu}")
                continue
            print(f"run: mode={mode} bs={bs} shared={ns} unique={nu}")
            times, warmup, prefill = bench_point(
                engine, mode, bs, ns, nu, args.iters,
                engine.config.vocab_size, args.measure_prefill,
                levels=args.levels, level2_bs=args.level2_bs,
                kv_quant=args.kv_quant, shared_kv_quant=args.shared_kv,
            )
            res = SynthBenchmarkResult(
                mode=mode, batch_size=bs, num_shared=ns, num_unique=nu,
                model=model_name, times=times, warmup_times=warmup,
                prefill_times=prefill,
            )
            if res.rstd > 0.1:
                print(f"WARNING: rstd {res.rstd:.3f} > 0.1 (noisy measurement)")
            print(f"  mean {res.mean_time*1e3:.2f} ms, {res.throughput:.0f} tok/s")
            save_yaml_dataclass(res, path)


if __name__ == "__main__":
    main()
