"""Cross-platform Mosaic lowering of every Pallas kernel.

Interpret mode (the rest of the CPU suite) does not enforce Mosaic's
layout/tiling rules; ``jax.export`` with ``platforms=['tpu']`` runs the
Pallas->Mosaic MLIR passes on a CPU-only host and raises on violations —
the error class that otherwise only surfaces on real hardware (final
machine-code compilation still happens on-device).
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax import export


def _lower(f, *args):
    export.export(jax.jit(f), platforms=["tpu"])(*args)


def test_flash_generic_lowers():
    from hydragen_tpu.ops.flash import flash_attention_bhsd

    q = jnp.zeros((1, 4, 256, 128), jnp.bfloat16)
    k = jnp.zeros((1, 4, 1024, 128), jnp.bfloat16)
    _lower(
        lambda q, k, v: flash_attention_bhsd(q, k, v, causal=True,
                                             interpret=False),
        q, k, k,
    )


def test_flash_int8_decode_rowbatched_lowers():
    from hydragen_tpu.ops.flash import flash_attention_bhsd

    # M <= 32 + R > 1 routes to the row-batched decode kernel.
    q = jnp.zeros((8, 8, 1, 128), jnp.bfloat16)
    k8 = jnp.zeros((8, 8, 256, 128), jnp.int8)
    sc = jnp.zeros((8, 8, 256), jnp.float32)
    lens = jnp.full((8,), 200, jnp.int32)
    _lower(
        lambda q, k, v, ks, vs, l: flash_attention_bhsd(
            q, k, v, kv_seq_lens=l, k_scale=ks, v_scale=vs, interpret=False
        ),
        q, k8, k8, sc, sc, lens,
    )


def test_decode_cached_with_merges_lowers():
    from hydragen_tpu.ops.decode import decode_attention_cached

    L, B, S, hkv, d, hq, b = 2, 8, 64, 8, 128, 16, 8
    q = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    k8 = jnp.zeros((L, B, S, hkv, d), jnp.int8)
    sc = jnp.zeros((L, B, S * hkv), jnp.float32)
    lens = jnp.full((b,), 32, jnp.int32)
    own = jnp.zeros((b, hkv, 1, d), jnp.bfloat16)
    osh = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    lsh = jnp.zeros((b, hq, 1), jnp.float32)
    _lower(
        lambda li, q, k, v, ks, vs, l, o1, o2, s1, s2: decode_attention_cached(
            li, q, k, v, kv_seq_lens=l, k_scale_all=ks, v_scale_all=vs,
            own_kv=(o1, o2), shared_partial=(s1, s2), interpret=False,
        ),
        jnp.int32(0), q, k8, k8, sc, sc, lens, own, own, osh, lsh,
    )


def test_cached_shared_flash_lowers():
    from hydragen_tpu.ops.flash import flash_attention_cached_bhsd

    q = jnp.zeros((1, 8, 256, 128), jnp.bfloat16)
    kall = jnp.zeros((2, 1, 8, 2048, 128), jnp.bfloat16)
    lens = jnp.full((1,), 2048, jnp.int32)
    _lower(
        lambda li, q, k, v, l: flash_attention_cached_bhsd(
            li, q, k, v, kv_seq_lens=l, interpret=False
        ),
        jnp.int32(0), q, kall, kall, lens,
    )


def test_w8a8_gemm_lowers():
    from hydragen_tpu.ops.gemm import w8a8_matmul

    aq = jnp.zeros((256, 1024), jnp.int8)
    asc = jnp.zeros((256, 1), jnp.float32)
    wq = jnp.zeros((512, 1024), jnp.int8)
    wsc = jnp.zeros((512,), jnp.bfloat16)
    _lower(
        lambda a, s, w, ws: w8a8_matmul(a, s, w, ws, block_n=256,
                                        block_k=256, interpret=False),
        aq, asc, wq, wsc,
    )


def test_w4a8_gemm_lowers():
    from hydragen_tpu.ops.gemm import w4a8_matmul

    aq = jnp.zeros((256, 1024), jnp.int8)
    asc = jnp.zeros((256, 1), jnp.float32)
    wqp = jnp.zeros((512, 512), jnp.int8)      # packed: K=1024 -> Kp=512
    gs = jnp.zeros((8, 512), jnp.bfloat16)     # group=128 -> G=8
    _lower(
        lambda a, s, w, g: w4a8_matmul(a, s, w, g, block_n=256,
                                       block_kp=256, interpret=False),
        aq, asc, wqp, gs,
    )


def test_w8a8_gemm_cached_lowers():
    from hydragen_tpu.ops.gemm import w8a8_matmul_cached

    aq = jnp.zeros((256, 4096), jnp.int8)
    asc = jnp.zeros((256, 1), jnp.float32)
    w_all = jnp.zeros((4, 4096, 4096), jnp.int8)
    ws_all = jnp.zeros((4, 4096), jnp.bfloat16)
    _lower(
        lambda li, a, s, w, g: w8a8_matmul_cached(
            li, a, s, w, g, block_n=512, block_k=1024, interpret=False,
        ),
        jnp.int32(1), aq, asc, w_all, ws_all,
    )


def test_w4a8_gemm_cached_lowers():
    from hydragen_tpu.ops.gemm import w4a8_matmul_cached

    aq = jnp.zeros((256, 1024), jnp.int8)
    asc = jnp.zeros((256, 1), jnp.float32)
    wp_all = jnp.zeros((4, 512, 512), jnp.int8)   # K=1024 packed
    gs_all = jnp.zeros((4, 8, 512), jnp.bfloat16)  # group 128
    _lower(
        lambda li, a, s, w, g: w4a8_matmul_cached(
            li, a, s, w, g, block_n=256, block_kp=256, interpret=False,
        ),
        jnp.int32(2), aq, asc, wp_all, gs_all,
    )


def test_decode_cached_int4_lowers():
    from hydragen_tpu.ops.decode import decode_attention_cached

    L, B, Sp, hkv, d, b, hq = 2, 8, 32, 8, 128, 8, 16  # 64 logical tokens
    q = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    kall = jnp.zeros((L, B, Sp, hkv, d), jnp.int8)
    sc = jnp.zeros((L, B, 2 * Sp * hkv), jnp.float32)
    lens = jnp.full((b,), 40, jnp.int32)
    k1 = jnp.zeros((b, hkv, 1, d), jnp.bfloat16)
    osh = jnp.zeros((b, hq, 1, d), jnp.bfloat16)
    lsh = jnp.zeros((b, hq, 1), jnp.float32)
    _lower(
        lambda li, q, k, v, l, ks, vs, k1, v1, o, s: decode_attention_cached(
            li, q, k, v, kv_seq_lens=l, k_scale_all=ks, v_scale_all=vs,
            own_kv=(k1, v1), shared_partial=(o, s), kv_bits=4,
            interpret=False,
        ),
        jnp.int32(0), q, kall, kall, lens, sc, sc, k1, k1, osh, lsh,
    )


def test_w8a8_gemm_cached_r5_tiles_lowers():
    """The r5 default tiles (block_n 1024, block_k 2048) and the full-L
    dynamic-row col-scale block at 7B depth (L=32) must stay legal — the
    flat7b postmortem: bf16 col-scale operands fail Mosaic's dynamic
    sublane load (needs 32-bit rows), hence the f32 materialization."""
    from hydragen_tpu.ops.gemm import w8a8_matmul_cached

    aq = jnp.zeros((256, 4096), jnp.int8)
    asc = jnp.zeros((256, 1), jnp.float32)
    w_all = jnp.zeros((32, 11264, 4096), jnp.int8)
    ws_all = jnp.zeros((32, 11264), jnp.bfloat16)
    _lower(
        lambda li, a, s, w, g: w8a8_matmul_cached(
            li, a, s, w, g, block_n=1024, block_k=2048, interpret=False,
        ),
        jnp.int32(1), aq, asc, w_all, ws_all,
    )


def test_flash_2d_scale_blocks_lower():
    """Round 5: per-token scales ride SCALE_ROWS-row 2D blocks of the flat
    [rows, s] array (generic + cached + row-batched decode forms); the old
    [rows, 1, s] unit-dim operand staged a degenerate T(1,128) relayout."""
    import functools

    from hydragen_tpu.ops.flash import (
        flash_attention_bhsd,
        flash_attention_cached_bhsd,
    )

    # Generic quantized path (rows = b*hkv = 32, a SCALE_ROWS multiple).
    q = jnp.zeros((4, 8, 64, 128), jnp.bfloat16)
    k = jnp.zeros((4, 8, 512, 128), jnp.int8)
    sc = jnp.zeros((4, 8, 512), jnp.float32)
    fn = functools.partial(flash_attention_bhsd, interpret=False)
    _lower(
        lambda q, k, v, ks, vs: fn(q, k, v, k_scale=ks, v_scale=vs),
        q, k, k, sc, sc,
    )

    # Row-batched decode form (rows=16 per cell at B=32).
    qd = jnp.zeros((4, 8, 1, 128), jnp.bfloat16)
    _lower(
        lambda q, k, v, ln, ks, vs: fn(
            q, k, v, kv_seq_lens=ln, k_scale=ks, v_scale=vs
        ),
        qd, k, k, jnp.full((4,), 512, jnp.int32), sc, sc,
    )

    # Cached stacked-level form at the 7B level geometry.
    fc = functools.partial(flash_attention_cached_bhsd, interpret=False)
    qf = jnp.zeros((1, 32, 256, 128), jnp.bfloat16)
    k_all = jnp.zeros((4, 1, 32, 2048, 128), jnp.int8)
    sc_all = jnp.zeros((4, 1, 32, 2048), jnp.float32)
    _lower(
        lambda li, q, k, v, ln, ks, vs: fc(
            li, q, k, v, kv_seq_lens=ln, k_scale_all=ks, v_scale_all=vs
        ),
        jnp.int32(1), qf, k_all, k_all, jnp.full((1,), 2048, jnp.int32),
        sc_all, sc_all,
    )


def test_gather_token_row_lowers():
    """Both forms of the int4 decode-write RMW row read at the 7B sweep
    shape (layer-select and all-layers; the all-layers form grids over L —
    a single [L, B, 1, hkv, d] block would exceed scoped VMEM)."""
    from functools import partial

    from hydragen_tpu.ops.decode import gather_token_row_cached

    buf = jnp.zeros((32, 256, 72, 32, 128), jnp.int8)
    _lower(
        partial(gather_token_row_cached, interpret=False),
        jnp.int32(3), jnp.int32(41), buf,
    )
    _lower(
        partial(gather_token_row_cached, None, interpret=False),
        jnp.int32(41), buf,
    )
