"""Weight-only INT8 quantization.

Beyond-reference capability (BASELINE.md north star: "Llama-2-7B, INT8
weights / FP8 KV"): decode at small batch is weight-bandwidth-bound, so
halving the bytes per weight (bf16 -> int8) is a direct ~2x decode lever on
TPU. The reference's vestigial int4 KV path (xformers_stuff.py:431-530) is
the pattern: scales packed beside payload, dequant fused into compute.

Scheme: symmetric per-output-channel int8. Because the scale is
per-output-channel, dequantization commutes with the contraction:

    y = x @ (w_q * s)  ==  (x @ w_q) * s

so the matmul runs on the int8 payload (cast to bf16 in VMEM — XLA fuses the
convert into the dot operand, never materializing a bf16 weight copy in HBM)
and the fp32 scale is one multiply on the small output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """int8 payload + bf16 per-output-channel scale.

    q: ``[..., out_features, in_features]`` int8 — stored TRANSPOSED
    relative to the logical ``[in, out]`` weight: with out-features on the
    sublane axis XLA's int8 matmul emitter streams the payload ~1.5x faster
    for skinny decode activations (measured 643 vs 438 GB/s on v5e).
    scale: ``[..., out_features]`` bfloat16 — the payload is quantized
    *against the bf16-rounded scale*, so storing bf16 costs no precision,
    and the bf16 epilogue multiply keeps the whole dequant chain in bf16:
    an f32 epilogue made XLA materialize transposed f32[b, out] relayout
    copies before the downcast (~96 x 4 MB per 7B decode step, HLO-verified
    round 3).
    """

    q: jax.Array
    scale: jax.Array

    @property
    def dtype(self):
        return self.q.dtype


def quantize(w: jax.Array, axis: int = -2) -> QuantizedTensor:
    """Symmetric int8 quantization, reducing over ``axis`` (in_features).

    w: ``[..., in, out]`` float; returns payload (stored ``[..., out, in]``)
    + scale s.t. ``w ~= swap(q) * scale[..., None, :]``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    # Round the scale to bf16 FIRST and quantize against it: the stored
    # bf16 scale is then exact (the int8 grid shifts by <0.4 %, absorbed by
    # the rounding), so the bf16 epilogue multiply adds no error.
    scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(wf / scale.astype(jnp.float32)), -127, 127
    ).astype(jnp.int8)
    return QuantizedTensor(
        q=jnp.swapaxes(q, -1, -2), scale=jnp.squeeze(scale, axis=axis)
    )


def dequantize(t: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Back to the logical ``[..., in, out]`` layout."""
    q = jnp.swapaxes(t.q, -1, -2)
    return (q.astype(jnp.float32) * t.scale[..., None, :]).astype(dtype)


def _swap_weight_term(subscripts: str) -> str:
    """'bth,hd->btd' -> 'bth,dh->btd' (weight operand axes reversed)."""
    ins, out = subscripts.split("->")
    x_term, w_term = ins.split(",")
    w_term = w_term[:-2] + w_term[-1] + w_term[-2]
    return f"{x_term},{w_term}->{out}"


def _w8a8_blocks(N: int, K: int):
    """Largest Mosaic-friendly (block_n, block_k) tiling N and K, or None."""
    if N % 128 or K % 128:
        return None
    bn = next(b for b in (512, 256, 128) if N % b == 0)
    bk = next(b for b in (1024, 512, 256, 128) if K % b == 0)
    return bn, bk


def qmatmul(x: jax.Array, w, subscripts: str, impl: str = "dq") -> jax.Array:
    """einsum over a maybe-quantized weight (``subscripts`` written for the
    logical ``[in, out]`` orientation).

    impl="dq" (default): contract against the transposed int8 payload (cast
    to the activation dtype; the convert fuses into the dot) then apply the
    per-output-channel scale once on the result — weight-only quantization,
    bf16 MXU rate.

    impl="w8a8": per-row dynamic activation quantization + the native
    s8xs8 Pallas GEMM (ops/gemm.py) — int8 MXU rate, ~0.3-0.5 % RMS
    activation noise per matmul (scripts/quality.py arbitrates). Applies
    when the weight is a per-layer 2D QuantizedTensor with 128-tileable
    dims on a TPU backend (every qmatmul subscript in the model contracts
    x's last axis against the stored payload's ``in`` axis); anything else
    falls back to "dq".
    """
    if isinstance(w, QuantizedTensor):
        if impl == "w8a8" and w.q.ndim == 2:
            N, K = w.q.shape
            blocks = _w8a8_blocks(N, K)
            interpret = None
            if jax.default_backend() != "tpu":
                import os

                # Interpret-mode pallas at model scale is too slow for the
                # CPU suite; opt in explicitly (tiny-dim e2e tests).
                interpret = bool(os.environ.get("HYDRAGEN_W8A8_INTERPRET"))
            if blocks is not None and x.shape[-1] == K and interpret is not False:
                from hydragen_tpu.ops.gemm import quantize_rows, w8a8_matmul

                lead = x.shape[:-1]
                a_q, a_s = quantize_rows(x.reshape(-1, K))
                y = w8a8_matmul(
                    a_q, a_s, w.q, w.scale, block_n=blocks[0],
                    block_k=blocks[1], out_dtype=x.dtype,
                    interpret=interpret,
                )
                return y.reshape(*lead, N)
        y = jnp.einsum(_swap_weight_term(subscripts), x, w.q.astype(x.dtype))
        # bf16 end to end: an f32 epilogue forced XLA to relayout the f32
        # product for the next matmul before downcasting (transposed 4 MB
        # copies per projection per decode step at 7B bs256).
        return y * w.scale.astype(x.dtype)[None, None, :]
    return jnp.einsum(subscripts, x, w)


# --- KV-cache quantization -------------------------------------------------
#
# Per-token-per-head symmetric int8: scale = amax over head_dim / 127. The
# reference's int4 KV path packs fp16 scale+shift in a row header
# (xformers_stuff.py:431-530); on TPU a separate small scale array keeps the
# payload layout MXU/DMA-friendly (int8 tiles) and the dequant multiply fuses
# into the attention matmul's operand read. v5e/v5p have no fp8 matmul units,
# so int8 is the native low-bit KV format here.


def quantize_kv(x: jax.Array):
    """x ``[..., d]`` float -> (q int8 ``[..., d]``, scale f32 ``[...]``)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, -1)


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_params(params: dict, quantize_lm_head: bool = True) -> dict:
    """Quantize the large projection matrices of a Llama param pytree.

    Embeddings stay high-precision (gather, not matmul); norms and biases are
    tiny. Per-layer matrices are stacked ``[L, in, out]`` — quantized with
    per-(layer, out-channel) scales. Each tensor is quantized under jit so
    the fp32 intermediates fuse away instead of materializing in HBM — a 7B
    model must quantize within a 16 GB chip's headroom.
    """
    quantize_jit = jax.jit(quantize, static_argnames=("axis",))
    out = dict(params)
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        layers[k] = quantize_jit(layers[k], axis=-2)
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_jit(params["lm_head"], axis=-2)
    return out
