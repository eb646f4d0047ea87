"""Pallas W8A8 GEMM: native s8 x s8 -> i32 matmuls on the MXU.

Why this exists: XLA emulates s8xs8 ``dot_general`` on TPU (~2 TOP/s
measured, 223 s compile — docs/results_v5e.md), so the engine's int8
weights feed the MXU as bf16 and the north-star decode step is pinned to
the ~166 TFLOP/s bf16 matmul floor (~20 ms/step at 7B bs 256). Mosaic,
however, lowers s8xs8 -> i32 ``dot_general`` natively (the int8 decode
kernel measured ~116 TOP/s on small attention blocks; v5e's int8 peak is
~394 TOP/s). If a GEMM-shaped kernel sustains well above 166 TOP/s, W8A8
halves the matmul floor — the single largest remaining north-star lever.

Quantization scheme (mirrors the attention kernels' discipline):
- weights: per-output-channel s8 (the engine's existing int8 storage),
- activations: per-row dynamic s8 (one scale per token row, computed on
  the fly — same ~0.3-0.5 % RMS noise class as the decode kernel's q/p
  re-quantization; scripts/quality.py arbitrates).

``w8a8_matmul`` computes ``act_s8 @ w_s8^T * (row_scale x col_scale)``
with the dequant epilogue fused into the kernel's emit.

Reference anchor: the int4/int8 fused-dequant pattern the reference embeds
in its kernels (/root/reference/hydragen/xformers_stuff.py:431-530);
W8A8 itself is beyond-reference (BASELINE.md quantized-engine goals).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydragen_tpu.ops.flash import LANES, _round_up


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row dynamic activation quantization: [M, K] -> (s8, f32 [M, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-20) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale


def _w8a8_kernel(
    a_ref,       # [block_m, block_k] s8
    w_ref,       # [block_n, block_k] s8  (weights stored [out, in])
    rs_ref,      # [block_m, 1] f32 row scales
    cs_ref,      # [1, block_n] f32 col (per-out-channel) scales
    o_ref,       # [block_m, block_n] out dtype
    acc_scr,     # [block_m, block_n] i32
    *,
    num_k_blocks: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += jax.lax.dot_general(
        a_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _emit():
        o_ref[...] = (
            acc_scr[...].astype(jnp.float32) * rs_ref[...] * cs_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype",
                     "interpret"),
)
def w8a8_matmul(
    a_q: jax.Array,       # [M, K] s8 activations (quantize_rows)
    a_scale: jax.Array,   # [M, 1] f32
    w_q: jax.Array,       # [N, K] s8 weights, [out, in] (engine storage)
    w_scale: jax.Array,   # [N] per-out-channel scales (any float dtype)
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """``a @ w^T`` with both operands int8 on the MXU's native s8 path.

    Returns ``[M, N]`` in ``out_dtype`` with the (row x out-channel)
    dequant epilogue fused into the kernel emit.
    """
    M, K = a_q.shape
    N, K2 = w_q.shape
    assert K == K2, (a_q.shape, w_q.shape)
    assert a_q.dtype == jnp.int8 and w_q.dtype == jnp.int8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_m is None:
        block_m = min(256, _round_up(M, 8))
    block_n = min(block_n, _round_up(N, LANES))
    block_k = min(block_k, _round_up(K, LANES))
    Mp = _round_up(M, block_m)
    assert N % block_n == 0 and K % block_k == 0, (
        f"N={N} K={K} must tile by ({block_n}, {block_k})"
    )

    ap = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
    rs = jnp.pad(a_scale.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    cs = w_scale.astype(jnp.float32).reshape(1, N)

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, num_k_blocks=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_n, block_k), lambda mi, ni, ki: (ni, ki)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(ap, w_q, rs, cs)
    return out[:M]


def _w8a8_cached_kernel(
    li_ref,      # scalar prefetch: [1] int32 layer index
    a_ref,       # [block_m, block_k] s8
    w_ref,       # [1, block_n, block_k] s8 — one layer's tile of [L, N, K]
    rs_ref,      # [block_m, 1] f32 row scales
    cs_ref,      # [L, block_n] f32 col scales — ALL layers' rows
    o_ref,       # [block_m, block_n] out dtype
    acc_scr,     # [block_m, block_n] i32
    *,
    num_k_blocks: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[...] += jax.lax.dot_general(
        a_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _emit():
        # Col scales ride in as a natural-layout f32 [L, N] array, this
        # N block's column of every layer, with the layer row picked
        # dynamically — the old [L, 1, N] unit-dim operand forced XLA to
        # stage it in a degenerate T(1,128) layout (~13 ms per array per
        # generate at 7B, r5 trace); the 2D form stages as one cheap
        # streaming convert. f32 (not the raw bf16 param): Mosaic cannot
        # dynamic-sublane-load packed 16-bit rows (r5 flat7b postmortem).
        cs = cs_ref[pl.ds(li_ref[0], 1), :]
        o_ref[...] = (
            acc_scr[...].astype(jnp.float32) * rs_ref[...] * cs
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype",
                     "interpret"),
)
def w8a8_matmul_cached(
    layer: jax.Array,         # scalar int32 layer index (scalar prefetch)
    a_q: jax.Array,           # [M, K] s8 activations (quantize_rows)
    a_scale: jax.Array,       # [M, 1] f32
    w_all: jax.Array,         # [L, N, K] s8 stacked weights (engine storage)
    w_scale_all: jax.Array,   # [L, N] per-(layer, out-channel) scales
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """``a @ w_all[layer]^T`` reading straight out of the STACKED weight
    buffer — the layer index rides scalar prefetch into the BlockSpec index
    maps, so no per-layer slice is ever materialized. Feeding per-layer
    slices to ``w8a8_matmul`` instead makes XLA copy each layer's whole
    payload to stage the pallas operand; under the unrolled 7B decode loop
    the latency-hiding scheduler kept many such ~45 MB copies alive and
    OOMed the 16 GB chip (round-4 bench_w8a8 postmortem)."""
    M, K = a_q.shape
    L, N, K2 = w_all.shape
    assert K == K2, (a_q.shape, w_all.shape)
    assert a_q.dtype == jnp.int8 and w_all.dtype == jnp.int8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_m is None:
        block_m = min(256, _round_up(M, 8))
    block_n = min(block_n, _round_up(N, LANES))
    block_k = min(block_k, _round_up(K, LANES))
    Mp = _round_up(M, block_m)
    assert N % block_n == 0 and K % block_k == 0, (
        f"N={N} K={K} must tile by ({block_n}, {block_k})"
    )

    ap = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
    rs = jnp.pad(a_scale.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    cs = w_scale_all.astype(jnp.float32)  # natural 2D layout (see kernel)
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_w8a8_cached_kernel, num_k_blocks=grid[2]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda mi, ni, ki, li_ref: (mi, ki)),
                pl.BlockSpec((1, block_n, block_k),
                             lambda mi, ni, ki, li_ref: (li_ref[0], ni, ki)),
                pl.BlockSpec((block_m, 1),
                             lambda mi, ni, ki, li_ref: (mi, 0)),
                # All layers' rows of this N block (L x block_n bf16 is
                # tiny and the index map is li-independent, so the DMA
                # happens once per (mi, ni)).
                pl.BlockSpec((L, block_n),
                             lambda mi, ni, ki, li_ref: (0, ni)),
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n), lambda mi, ni, ki, li_ref: (mi, ni)
            ),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(li, ap, w_all, rs, cs)
    return out[:M]


def w8a8_reference(a_q, a_scale, w_q, w_scale, out_dtype=jnp.bfloat16):
    """f32 oracle for the kernel (exact: int8 values are exact in f32)."""
    acc = jnp.einsum(
        "mk,nk->mn", a_q.astype(jnp.float32), w_q.astype(jnp.float32)
    )
    return (
        acc * a_scale.astype(jnp.float32)
        * w_scale.astype(jnp.float32)[None, :]
    ).astype(out_dtype)


# ---------------------------------------------------------------------------
# W4A8: INT4 planar-packed weights, s8 activations
# ---------------------------------------------------------------------------
#
# The packed byte j of a row holds in-feature j (low nibble) and in-feature
# j + K/2 (high nibble) — ops/quant.py pack4. A K-block of bkp packed bytes
# therefore covers TWO contiguous K-ranges: [j0, j0+bkp) from the low plane
# and [K/2+j0, K/2+j0+bkp) from the high plane; the kernel takes the two
# matching activation blocks via two index maps on the same array and never
# interleaves lanes. Group scales (ops/quant.py Quantized4Tensor) live on
# the contracted axis, so they cannot commute to the output: the kernel
# runs one s8 MXU sub-dot per (plane, group) and scales each partial into
# an f32 accumulator. Weight HBM traffic is half of w8a8's at the same s8
# FLOP rate — at decode the projections are weight-bandwidth-dominated, so
# this targets the post-W8A8 binding roofline term (docs/results_v5e.md).


def _w4a8_kernel(
    a_lo_ref,    # [block_m, block_kp] s8 — activations, low-plane K range
    a_hi_ref,    # [block_m, block_kp] s8 — activations, high-plane K range
    wp_ref,      # [block_n, block_kp] s8 — packed nibbles
    rs_ref,      # [block_m, 1] f32 row scales
    gs_ref,      # [G, block_n] f32 — ALL groups' scales for this N block
    o_ref,       # [block_m, block_n] out dtype
    acc_scr,     # [block_m, block_n] f32
    *,
    num_k_blocks: int,
    group: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    w32 = wp_ref[...].astype(jnp.int32)
    planes = (
        (a_lo_ref, 0, ((w32 << 28) >> 28).astype(jnp.int8)),
        (a_hi_ref, gs_ref.shape[0] // 2, (w32 >> 4).astype(jnp.int8)),
    )
    bkp = wp_ref.shape[1]
    gpb = bkp // group
    for a_ref, plane_group0, w in planes:
        for g in range(gpb):
            part = jax.lax.dot_general(
                a_ref[:, g * group:(g + 1) * group],
                w[:, g * group:(g + 1) * group],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # This sub-dot's group scale: one [1, block_n] row of the full
            # scale block, dynamically indexed on the SUBLANE axis (scales
            # are stored [groups, out] precisely so the lane-axis broadcast
            # below needs no sublane->lane relayout; a per-K-block scale
            # BlockSpec would violate Mosaic's 8-sublane block minimum).
            row = plane_group0 + ki * gpb + g
            gs_row = gs_ref[pl.dslice(row, 1), :]
            acc_scr[...] += part.astype(jnp.float32) * gs_row

    @pl.when(ki == num_k_blocks - 1)
    def _emit():
        o_ref[...] = (acc_scr[...] * rs_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_kp", "out_dtype",
                     "interpret"),
)
def w4a8_matmul(
    a_q: jax.Array,       # [M, K] s8 activations (quantize_rows)
    a_scale: jax.Array,   # [M, 1] f32
    w_qp: jax.Array,      # [N, K//2] s8 planar-packed int4 (quant.pack4)
    w_gscale: jax.Array,  # [G, N] group scales (any float dtype)
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_kp: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """``a @ unpack(w)^T`` with int4 weights unpacked in-register onto the
    MXU's native s8 path; (group x out-channel) dequant fused per sub-dot,
    per-row activation scale fused into the emit. Returns ``[M, N]``."""
    M, K = a_q.shape
    N, Kp = w_qp.shape
    assert K == 2 * Kp, (a_q.shape, w_qp.shape)
    assert a_q.dtype == jnp.int8 and w_qp.dtype == jnp.int8
    G, N2 = w_gscale.shape
    assert N2 == N and K % G == 0, (w_gscale.shape, K, N)
    group = K // G
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_m is None:
        block_m = min(256, _round_up(M, 8))
    block_n = min(block_n, _round_up(N, LANES))
    block_kp = min(block_kp, _round_up(Kp, LANES))
    Mp = _round_up(M, block_m)
    assert N % block_n == 0 and Kp % block_kp == 0, (
        f"N={N} Kp={Kp} must tile by ({block_n}, {block_kp})"
    )
    assert block_kp % group == 0 and group % LANES == 0, (
        f"group {group} must divide block_kp {block_kp} and tile lanes"
    )

    ap = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
    rs = jnp.pad(a_scale.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    gs = w_gscale.astype(jnp.float32)  # 32-bit rows: dynamic sublane loads

    kb = Kp // block_kp           # packed K blocks == grid dim 2
    grid = (Mp // block_m, N // block_n, kb)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, num_k_blocks=kb, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_kp), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec(
                (block_m, block_kp), lambda mi, ni, ki: (mi, kb + ki)
            ),
            pl.BlockSpec((block_n, block_kp), lambda mi, ni, ki: (ni, ki)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            # ALL groups' scales for this N block (G x block_n f32 is tiny;
            # the index map is ki-independent so the DMA happens once per
            # (mi, ni)); the kernel picks each sub-dot's row dynamically.
            pl.BlockSpec((G, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(ap, ap, w_qp, rs, gs)
    return out[:M]


def _w4a8_cached_kernel(
    li_ref,      # scalar prefetch: [1] int32 layer index
    a_lo_ref,    # [block_m, block_kp] s8
    a_hi_ref,    # [block_m, block_kp] s8
    wp_ref,      # [1, block_n, block_kp] s8 — one layer's packed tile
    rs_ref,      # [block_m, 1] f32
    gs_ref,      # [1, G, block_n] f32 — this layer's group scales
    o_ref,       # [block_m, block_n]
    acc_scr,     # [block_m, block_n] f32
    *,
    num_k_blocks: int,
    group: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    w32 = wp_ref[0].astype(jnp.int32)
    planes = (
        (a_lo_ref, 0, ((w32 << 28) >> 28).astype(jnp.int8)),
        (a_hi_ref, gs_ref.shape[1] // 2, (w32 >> 4).astype(jnp.int8)),
    )
    bkp = wp_ref.shape[2]
    gpb = bkp // group
    for a_ref, plane_group0, w in planes:
        for g in range(gpb):
            part = jax.lax.dot_general(
                a_ref[:, g * group:(g + 1) * group],
                w[:, g * group:(g + 1) * group],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            row = plane_group0 + ki * gpb + g
            gs_row = gs_ref[0, pl.dslice(row, 1), :]
            acc_scr[...] += part.astype(jnp.float32) * gs_row

    @pl.when(ki == num_k_blocks - 1)
    def _emit():
        o_ref[...] = (acc_scr[...] * rs_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_kp", "out_dtype",
                     "interpret"),
)
def w4a8_matmul_cached(
    layer: jax.Array,          # scalar int32 (scalar prefetch)
    a_q: jax.Array,            # [M, K] s8 activations
    a_scale: jax.Array,        # [M, 1] f32
    w_qp_all: jax.Array,       # [L, N, K//2] s8 planar-packed int4
    w_gscale_all: jax.Array,   # [L, G, N] group scales
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_kp: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Stacked-weight variant of :func:`w4a8_matmul` (layer index on scalar
    prefetch — see :func:`w8a8_matmul_cached` for why slices are poison)."""
    M, K = a_q.shape
    L, N, Kp = w_qp_all.shape
    assert K == 2 * Kp, (a_q.shape, w_qp_all.shape)
    assert a_q.dtype == jnp.int8 and w_qp_all.dtype == jnp.int8
    L2, G, N2 = w_gscale_all.shape
    assert L2 == L and N2 == N and K % G == 0, (w_gscale_all.shape, K, N)
    group = K // G
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_m is None:
        block_m = min(256, _round_up(M, 8))
    block_n = min(block_n, _round_up(N, LANES))
    block_kp = min(block_kp, _round_up(Kp, LANES))
    Mp = _round_up(M, block_m)
    assert N % block_n == 0 and Kp % block_kp == 0, (
        f"N={N} Kp={Kp} must tile by ({block_n}, {block_kp})"
    )
    assert block_kp % group == 0 and group % LANES == 0, (
        f"group {group} must divide block_kp {block_kp} and tile lanes"
    )

    ap = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
    rs = jnp.pad(a_scale.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    gs = w_gscale_all.astype(jnp.float32)  # 32-bit rows: dynamic sublane loads
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)

    kb = Kp // block_kp
    grid = (Mp // block_m, N // block_n, kb)
    out = pl.pallas_call(
        functools.partial(_w4a8_cached_kernel, num_k_blocks=kb, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_kp),
                             lambda mi, ni, ki, li_ref: (mi, ki)),
                pl.BlockSpec((block_m, block_kp),
                             lambda mi, ni, ki, li_ref: (mi, kb + ki)),
                pl.BlockSpec((1, block_n, block_kp),
                             lambda mi, ni, ki, li_ref: (li_ref[0], ni, ki)),
                pl.BlockSpec((block_m, 1),
                             lambda mi, ni, ki, li_ref: (mi, 0)),
                pl.BlockSpec((1, G, block_n),
                             lambda mi, ni, ki, li_ref: (li_ref[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec(
                (block_m, block_n), lambda mi, ni, ki, li_ref: (mi, ni)
            ),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(li, ap, ap, w_qp_all, rs, gs)
    return out[:M]


def w4a8_reference(a_q, a_scale, w_qp, w_gscale, out_dtype=jnp.bfloat16):
    """f32 oracle: dequantize the int4 weight group-wise, f32 matmul."""
    from hydragen_tpu.ops.quant import unpack4

    lo, hi = unpack4(w_qp)
    w = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)  # [N, K]
    N, K = w.shape
    G = w_gscale.shape[0]
    w = w.reshape(N, G, K // G) * w_gscale.astype(jnp.float32).T[:, :, None]
    acc = jnp.einsum("mk,nk->mn", a_q.astype(jnp.float32), w.reshape(N, K))
    return (acc * a_scale.astype(jnp.float32)).astype(out_dtype)
