"""Attention-op microbenchmark: hydragen vs plain flash attention.

Counterpart of /root/reference/scripts/microbenchmark.py:28-241: time the
hydragen attention op (one shared level + per-sequence unique KV) against a
single flash-attention call over the concatenated prefix+suffix KV — the
kernel-level version of the paper's Fig. 5 (>16x at large bs·prefix).

Defaults mirror the reference: qheads=8, kvheads=1 (one GQA group of a TP
shard), head dim 128. No L2-flush analogue is needed: the KV tensors far
exceed TPU VMEM, so every iteration streams from HBM.
"""

from __future__ import annotations

import argparse
import itertools
from pathlib import Path

import jax
import jax.numpy as jnp

from hydragen_tpu.utils import MicrobenchmarkResult, save_yaml_dataclass, split_range
from hydragen_tpu.utils.timing import timed_scanned


def make_inputs(key, bs, ns, nu, hq, hkv, d, dtype):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (bs, 1, hq, d), dtype)
    shared_k = jax.random.normal(ks[1], (1, ns, hkv, d), dtype)
    shared_v = jax.random.normal(ks[2], (1, ns, hkv, d), dtype)
    uk = jax.random.normal(ks[3], (bs, nu, hkv, d), dtype) if nu else None
    uv = jax.random.normal(ks[4], (bs, nu, hkv, d), dtype) if nu else None
    return q, shared_k, shared_v, uk, uv


def go_hydragen(q, sk, sv, uk, uv, nu, bs):
    from hydragen_tpu.ops.hydragen import hydragen_attention

    seq_lens = jnp.full((bs,), nu, jnp.int32) if nu else None

    if uk is None:
        return (lambda q, sk, sv: hydragen_attention(
            q, None, None, [sk], [sv], [None])), (q, sk, sv)
    return (lambda q, sk, sv, uk, uv: hydragen_attention(
        q, uk, uv, [sk], [sv], [None], seq_lens=seq_lens)), (q, sk, sv, uk, uv)


def go_baseline(q, sk, sv, uk, uv, nu, bs):
    """Plain flash attention over per-sequence concatenated prefix+suffix."""
    from hydragen_tpu.ops.flash import flash_attention

    ns = sk.shape[1]

    def fn(q, sk, sv, uk=None, uv=None):
        k = jnp.broadcast_to(sk, (bs, ns) + sk.shape[2:])
        v = jnp.broadcast_to(sv, (bs, ns) + sv.shape[2:])
        if uk is not None:
            k = jnp.concatenate([k, uk], axis=1)
            v = jnp.concatenate([v, uv], axis=1)
        out, _ = flash_attention(q, k, v, causal=False)
        return out

    if uk is None:
        return fn, (q, sk, sv)
    return fn, (q, sk, sv, uk, uv)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("outdir", type=Path)
    p.add_argument("--bs", default="512", help="e.g. 512:4096:x2")
    p.add_argument("--num-shared", default="2048", help="e.g. 512:8192:x2")
    p.add_argument("--num-unique", default="128", help="e.g. 0,128,512")
    p.add_argument("--qheads", type=int, default=8)
    p.add_argument("--kvheads", type=int, default=1)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--modes", default="hydragen,baseline")
    args = p.parse_args()

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    args.outdir.mkdir(parents=True, exist_ok=True)
    modes = args.modes.split(",")

    for bs, ns, nu in itertools.product(
        split_range(args.bs), split_range(args.num_shared), split_range(args.num_unique)
    ):
        q, sk, sv, uk, uv = make_inputs(
            jax.random.PRNGKey(0), bs, ns, nu, args.qheads, args.kvheads,
            args.dim, dtype,
        )
        for mode in modes:
            path = args.outdir / f"{mode}_bs{bs}_ns{ns}_nu{nu}.yaml"
            if path.exists():
                print(f"skip (exists): {path}")
                continue
            maker = go_hydragen if mode == "hydragen" else go_baseline
            op, op_args = maker(q, sk, sv, uk, uv, nu, bs)
            per_call = timed_scanned(op, op_args, num_iters=args.iters)
            res = MicrobenchmarkResult(
                batch_size=bs, num_shared=ns, num_unique=nu,
                num_qheads=args.qheads, num_kvheads=args.kvheads,
                head_dim=args.dim, mode=mode, times=[per_call],
            )
            print(f"{mode} bs={bs} ns={ns} nu={nu}: {res.mean_time*1e6:.0f} us")
            save_yaml_dataclass(res, path)


if __name__ == "__main__":
    main()
