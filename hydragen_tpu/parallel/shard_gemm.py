"""shard_map wrappers: the s8 MXU GEMMs under a (dp, sp, tp) mesh.

A ``pallas_call`` is opaque to GSPMD, so rounds 3-4 forced sharded runs onto
the weight-only dq path (``ForwardSpec.matmul == "dq"``), re-losing the
measured w8a8 win (gate/up: 100 vs 140 us at the 7B decode M) exactly where
the reference's TP numbers assume the fast kernels run under TP
(/root/reference/hydragen/tp.py:84-112). These wrappers run the stacked
``*_cached`` GEMMs (ops/gemm.py) per shard.

Two decompositions:

- COLUMN-parallel (q/k/v/gate/up — output features over ``tp``,
  ``sharded_qmatmul_stacked``): the N dim partitions trivially, the
  activation is tp-replicated so the shared per-row quantization is
  bitwise identical to the single-chip path, and no collective is needed
  — the output stays tp-sharded.
- ROW-parallel (o/down — input features over ``tp``,
  ``sharded_qmatmul_stacked_row``): each shard quantizes its K-slice of
  the activation per row (a per-shard row scale — the same noise class as
  the global one) and contributes a fully-dequantized bf16 partial; the
  exact psum over ``tp`` replaces the all-reduce GSPMD inserts for the dq
  path, so the collective surface is unchanged (tp.py:84-112 contract,
  pinned by tests/test_comm.py). INT4 row-parallel stays dq: the planar
  nibble pack puts two non-contiguous K-ranges in each shard's payload
  slice, which no contiguous activation sharding matches.

Weights are sp-replicated; each sp shard duplicates the GEMM. At decode the
GEMM is weight-bandwidth-bound and every sp shard reads its own replica's
bytes regardless, so splitting rows over sp would not reduce per-device
time — rows split over dp only.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hydragen_tpu.parallel.shard_attn import _axis_size, shard_map


def mesh_s8_gemm_eligible(
    mesh: Optional[Mesh], rows: int, k_dim: int, w_stacked, impl: str,
) -> bool:
    """Would ``sharded_qmatmul_stacked`` accept this (activation, weight)?

    ``rows`` = the activation's leading batch dim (dp-sharded); the weight
    must be a stacked [L, N, K] QuantizedTensor (w8a8) / [L, N, K/2]
    Quantized4Tensor (w4a8) whose PER-SHARD N still tiles the kernel's
    lane blocks. The caller separately guarantees the weight is actually
    placed column-sharded (parallel/sharding.py param_pspecs)."""
    from hydragen_tpu.ops.quant import (
        Quantized4Tensor,
        QuantizedTensor,
        _s8_interpret,
        _w4a8_blocks,
        _w8a8_blocks,
    )

    if mesh is None or _s8_interpret() is False:
        return False
    dp, tp = _axis_size(mesh, "dp"), _axis_size(mesh, "tp")
    if rows % dp:
        return False
    if impl == "w8a8" and isinstance(w_stacked, QuantizedTensor) \
            and w_stacked.q.ndim == 3:
        L, N, K = w_stacked.q.shape
        return (
            N % tp == 0
            and K == k_dim
            and _w8a8_blocks(N // tp, K) is not None
        )
    if impl == "w4a8" and isinstance(w_stacked, Quantized4Tensor) \
            and w_stacked.qp.ndim == 3:
        L, N, Kp = w_stacked.qp.shape
        return (
            N % tp == 0
            and 2 * Kp == k_dim
            and _w4a8_blocks(N // tp, 2 * Kp, w_stacked.group_size) is not None
        )
    return False


@functools.partial(jax.jit, static_argnames=("mesh", "impl", "interpret"))
def sharded_qmatmul_stacked(
    layer: jax.Array,
    a_q: jax.Array,
    a_s: jax.Array,
    w_stacked,
    *,
    mesh: Mesh,
    impl: str,
    interpret: Optional[bool] = None,
):
    """Column-parallel stacked s8 GEMM: ``a @ w_all[layer]^T`` per tp shard.

    a_q ``[M, K]`` s8 / a_s ``[M, 1]`` f32 (rows over dp, replicated over
    tp/sp — quantized ONCE outside, shared across the projections consuming
    the same activation); w_stacked a stacked QuantizedTensor /
    Quantized4Tensor with output features over tp. Returns ``[M, N]`` in
    bf16, rows over dp, N over tp — no collective (column parallelism).
    """
    from hydragen_tpu.ops.quant import (
        Quantized4Tensor,
        _w4a8_blocks,
        _w8a8_blocks,
    )

    tp = _axis_size(mesh, "tp")
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)
    M, K = a_q.shape
    int4 = isinstance(w_stacked, Quantized4Tensor)
    if int4:
        L, N, Kp = w_stacked.qp.shape
        bn, bkp = _w4a8_blocks(N // tp, K, w_stacked.group_size)
    else:
        L, N, _ = w_stacked.q.shape
        bn, bk = _w8a8_blocks(N // tp, K)

    def body(li, a_q, a_s, wq, ws):
        if int4:
            from hydragen_tpu.ops.gemm import w4a8_matmul_cached

            return w4a8_matmul_cached(
                li[0], a_q, a_s, wq, ws, block_n=bn, block_kp=bkp,
                out_dtype=jnp.bfloat16, interpret=interpret,
            )
        from hydragen_tpu.ops.gemm import w8a8_matmul_cached

        return w8a8_matmul_cached(
            li[0], a_q, a_s, wq, ws, block_n=bn, block_k=bk,
            out_dtype=jnp.bfloat16, interpret=interpret,
        )

    a_spec = P("dp", None)
    if int4:
        w_ops = (w_stacked.qp, w_stacked.gscale)
        w_specs = (P(None, "tp", None), P(None, None, "tp"))
    else:
        w_ops = (w_stacked.q, w_stacked.scale)
        w_specs = (P(None, "tp", None), P(None, "tp"))
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None), a_spec, a_spec) + w_specs,
        out_specs=P("dp", "tp"),
        check_rep=False,
    )(li, a_q, a_s, *w_ops)


def mesh_s8_gemm_row_eligible(
    mesh: Optional[Mesh], rows: int, k_dim: int, w_stacked, impl: str,
) -> bool:
    """Would ``sharded_qmatmul_stacked_row`` accept this (activation,
    weight)? Row-parallel (input features over tp): w8a8 stacked
    QuantizedTensor only (int4's planar pack cannot row-shard — see the
    module docstring); each tp shard's K-slice must still tile the
    kernel's K blocks and the full N must tile its lane blocks."""
    from hydragen_tpu.ops.quant import (
        QuantizedTensor,
        _s8_interpret,
        _w8a8_blocks,
    )

    if mesh is None or impl != "w8a8" or _s8_interpret() is False:
        return False
    dp, tp = _axis_size(mesh, "dp"), _axis_size(mesh, "tp")
    if rows % dp:
        return False
    if not (isinstance(w_stacked, QuantizedTensor) and w_stacked.q.ndim == 3):
        return False
    L, N, K = w_stacked.q.shape
    return (
        K == k_dim
        and K % tp == 0
        and _w8a8_blocks(N, K // tp) is not None
    )


@functools.partial(jax.jit, static_argnames=("mesh", "interpret"))
def sharded_qmatmul_stacked_row(
    layer: jax.Array,
    x: jax.Array,
    w_stacked,
    *,
    mesh: Mesh,
    interpret: Optional[bool] = None,
):
    """Row-parallel stacked w8a8 GEMM: K-sliced partial per tp shard, exact
    bf16 psum.

    x ``[M, K]`` float (rows over dp, K over tp — the layer body's
    attention output / silu·up product is already head/channel-sharded
    there); w_stacked a stacked QuantizedTensor whose INPUT features are
    tp-sharded (payload ``[L, N, K]`` K-sharded; per-out-channel scales
    replicated). Each shard quantizes its K-slice per row and emits a
    fully-dequantized bf16 partial; the psum over tp is the same
    per-sublayer all-reduce the dq path's GSPMD partition inserts.
    Returns ``[M, N]`` bf16, rows over dp, replicated over tp.
    """
    from hydragen_tpu.ops.quant import _w8a8_blocks

    tp = _axis_size(mesh, "tp")
    li = jnp.reshape(layer, (1,)).astype(jnp.int32)
    M, K = x.shape
    L, N, _ = w_stacked.q.shape
    bn, bk = _w8a8_blocks(N, K // tp)

    def body(li, x, wq, ws):
        from hydragen_tpu.ops.gemm import quantize_rows, w8a8_matmul_cached

        a_q, a_s = quantize_rows(x)
        y = w8a8_matmul_cached(
            li[0], a_q, a_s, wq, ws, block_n=bn, block_k=bk,
            out_dtype=jnp.bfloat16, interpret=interpret,
        )
        if tp > 1:
            y = jax.lax.psum(y, "tp")
        return y

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None), P("dp", "tp"),
            P(None, None, "tp"), P(None, None),
        ),
        out_specs=P("dp", None),
        check_rep=False,
    )(li, x, w_stacked.q, w_stacked.scale)
