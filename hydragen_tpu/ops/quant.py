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

import math
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


class Quantized4Tensor(NamedTuple):
    """INT4 payload (two nibbles per int8 byte) + per-(group, out) scales.

    qp: ``[..., out, in//2]`` int8 — PLANAR nibble packing of the int4
    weight stored ``[out, in]``-transposed like :class:`QuantizedTensor`:
    byte ``j`` holds in-feature ``j`` in its LOW nibble and in-feature
    ``j + in//2`` in its HIGH nibble. The planar split (halves of K, not
    even/odd interleave) means unpacking never has to interleave lanes —
    each nibble plane is a contiguous K-range that dots against the
    matching contiguous slice of the activations (ops/gemm.py w4a8 kernel).
    gscale: ``[..., groups, out]`` bfloat16 — symmetric scale per
    (K-group, out-channel); ``group = in // groups`` is derivable, always
    divides ``in//2`` (each group lies entirely inside one nibble plane).
    Group-wise (not per-channel) scales are what make 4-bit usable: one
    outlier in a K-row no longer stretches the 15-step grid across the
    whole channel. Stored ``[groups, out]`` (not ``[out, groups]``) so a
    kernel block's per-group scale row broadcasts along lanes without a
    sublane->lane relayout (Mosaic cannot reshape sublanes to lanes).

    Beyond-reference: the reference's int4 exists only for the KV cache
    (xformers_stuff.py:431-530, fp16 scale+shift row headers); int4
    *weights* halve weight HBM traffic vs int8 — the binding term of the
    decode roofline once the W8A8 MXU path lifts the matmul floor
    (docs/results_v5e.md roofline).
    """

    qp: jax.Array
    gscale: jax.Array

    @property
    def dtype(self):
        return self.qp.dtype

    @property
    def in_features(self) -> int:
        return self.qp.shape[-1] * 2

    @property
    def group_size(self) -> int:
        return self.in_features // self.gscale.shape[-2]


def pick_group4(in_features: int, group: int = 128) -> int:
    """Largest group size <= ``group`` that divides the nibble-plane width
    ``in//2`` (so groups never straddle the planar pack boundary)."""
    assert in_features % 2 == 0, f"odd in_features {in_features}"
    half = in_features // 2
    return math.gcd(half, min(group, half))


def pack4(q4: jax.Array) -> jax.Array:
    """int4 values in an int8 array ``[..., in]`` (range [-8, 7]) ->
    planar-packed ``[..., in//2]`` int8."""
    half = q4.shape[-1] // 2
    lo = q4[..., :half].astype(jnp.int32)
    hi = q4[..., half:].astype(jnp.int32)
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def unpack4(qp: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packed int8 ``[..., in//2]`` -> (low, high) int8 nibble planes,
    sign-extended. Shift arithmetic runs in int32 (int8 shift overflow is
    implementation-defined; i32 is also what Mosaic vectorizes)."""
    q32 = qp.astype(jnp.int32)
    lo = ((q32 << 28) >> 28).astype(jnp.int8)
    hi = (q32 >> 4).astype(jnp.int8)  # byte sign extension == nibble sign
    return lo, hi


def quantize4(w: jax.Array, group: int = 128) -> Quantized4Tensor:
    """Symmetric int4 group-wise quantization over in_features (axis -2).

    w: ``[..., in, out]`` float. Scales are bf16-rounded FIRST and the
    payload quantized against them (same no-extra-error discipline as
    :func:`quantize`). Range [-7, 7]: symmetric, zero exactly encodable.
    """
    *lead, K, N = w.shape
    g = pick_group4(K, group)
    G = K // g
    wf = w.astype(jnp.float32).reshape(*lead, G, g, N)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    gscale = (jnp.maximum(amax, 1e-8) / 7.0).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(wf / gscale.astype(jnp.float32)), -7, 7)
    q = q.astype(jnp.int8).reshape(*lead, K, N)
    return Quantized4Tensor(
        qp=pack4(jnp.swapaxes(q, -1, -2)),
        gscale=jnp.squeeze(gscale, -2),
    )


def dequantize4(t: Quantized4Tensor, dtype=jnp.bfloat16) -> jax.Array:
    """Back to the logical ``[..., in, out]`` layout."""
    lo, hi = unpack4(t.qp)
    q = jnp.swapaxes(jnp.concatenate([lo, hi], axis=-1), -1, -2)
    *lead, K, N = q.shape
    G = t.gscale.shape[-2]
    wf = q.astype(jnp.float32).reshape(*lead, G, K // G, N)
    wf = wf * t.gscale.astype(jnp.float32)[..., :, None, :]
    return wf.reshape(*lead, K, N).astype(dtype)


def _swap_weight_term(subscripts: str) -> str:
    """'bth,hd->btd' -> 'bth,dh->btd' (weight operand axes reversed)."""
    ins, out = subscripts.split("->")
    x_term, w_term = ins.split(",")
    w_term = w_term[:-2] + w_term[-1] + w_term[-2]
    return f"{x_term},{w_term}->{out}"


def _gemm_env_block(name: str) -> int | None:
    import os

    v = os.environ.get(name)
    if not v:
        return None
    n = int(v)
    # Silently ignore illegal overrides (the ladder falls back to legal
    # defaults): sub-128 tiles cannot lane-tile and 0 would divide-by-zero.
    return n if n >= 128 and n % 128 == 0 else None


def _w8a8_blocks(N: int, K: int):
    """Largest Mosaic-friendly (block_n, block_k) tiling N and K, or None.

    Ladder heads (1024, 2048) are the measured r5 optimum: fewer, larger
    blocks shorten the per-cell dot chain the i32 accumulator serializes —
    M=256 ladder: qkv 32.9 us (261 TOP/s) vs 47-50 at (512, 1024); down
    126 vs 188; e2e bench 8,456 vs 7,758 tok/s (results/r5_measure/
    gemm_blocks_n1024, bench_all_n1024_bk2048). VMEM at the max tile:
    (256x2048 a + 1024x2048 w) s8 triple-buffered + 256x1024 i32 acc
    ~= 8.5 MB — inside the 16 MB scoped budget.
    HYDRAGEN_GEMM_BLOCK_N/_K (read at trace time) prepend a candidate."""
    if N % 128 or K % 128:
        return None
    env_n, env_k = _gemm_env_block("HYDRAGEN_GEMM_BLOCK_N"), _gemm_env_block(
        "HYDRAGEN_GEMM_BLOCK_K"
    )
    n_ladder = ([env_n] if env_n else []) + [1024, 512, 256, 128]
    k_ladder = ([env_k] if env_k else []) + [2048, 1024, 512, 256, 128]
    bn = next((b for b in n_ladder if N % b == 0), None)
    bk = next((b for b in k_ladder if K % b == 0), None)
    return None if bn is None or bk is None else (bn, bk)


def _w4a8_blocks(N: int, K: int, group: int):
    """(block_n, block_kp) for the w4a8 kernel, or None if ineligible.

    block_kp tiles the PACKED dim ``K//2`` in 128-lane multiples and must be
    a multiple of the scale group (the kernel applies group scales on whole
    sub-dots)."""
    if N % 128 or K % 256 or group % 128:
        return None
    kp = K // 2
    bn = next(b for b in (512, 256, 128) if N % b == 0)
    bkp = next(
        (b for b in (512, 256, 128) if kp % b == 0 and b % group == 0), None
    )
    return None if bkp is None else (bn, bkp)


def _s8_interpret():
    """Pallas interpret flag for the s8 GEMM paths: None on TPU (run
    native); True off-TPU only when HYDRAGEN_W8A8_INTERPRET opts in
    (interpret-mode pallas at model scale is too slow for the CPU suite);
    False = ineligible, caller falls back to dq."""
    if jax.default_backend() == "tpu":
        return None
    import os

    return bool(os.environ.get("HYDRAGEN_W8A8_INTERPRET"))


def s8_stacked_eligible(x: jax.Array, w_stacked, impl: str) -> bool:
    """Would :func:`qmatmul_stacked` route this call to an s8 Pallas GEMM?

    Lets the model body pre-quantize an activation ONCE and share the
    (payload, scale) pair across every projection consuming it (q/k/v off
    one rmsnorm; gate/up off the other) instead of re-running the per-row
    amax/divide pass per projection."""
    if (
        impl == "w8a8"
        and isinstance(w_stacked, QuantizedTensor)
        and w_stacked.q.ndim == 3
    ):
        L, N, K = w_stacked.q.shape
        return (
            _w8a8_blocks(N, K) is not None
            and x.shape[-1] == K
            and _s8_interpret() is not False
        )
    if (
        impl == "w4a8"
        and isinstance(w_stacked, Quantized4Tensor)
        and w_stacked.qp.ndim == 3
    ):
        L, N, Kp = w_stacked.qp.shape
        K = 2 * Kp
        return (
            _w4a8_blocks(N, K, w_stacked.group_size) is not None
            and x.shape[-1] == K
            and _s8_interpret() is not False
        )
    return False


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

    impl="w4a8": same per-row activation quantization against an INT4
    planar-packed weight (``Quantized4Tensor``) — the kernel unpacks
    nibbles in-register and runs two s8 MXU dots per K-block, halving
    weight HBM traffic on top of the s8 FLOP rate. Ineligible shapes (and
    any Quantized4Tensor under impl="dq", e.g. sharded runs — GSPMD cannot
    partition a pallas_call) dequantize group-wise and run the bf16 MXU.
    """
    if isinstance(w, Quantized4Tensor):
        if impl == "w4a8" and w.qp.ndim == 2:
            N, Kp = w.qp.shape
            K = 2 * Kp
            blocks = _w4a8_blocks(N, K, w.group_size)
            interpret = _s8_interpret()
            if blocks is not None and x.shape[-1] == K and interpret is not False:
                from hydragen_tpu.ops.gemm import quantize_rows, w4a8_matmul

                lead = x.shape[:-1]
                a_q, a_s = quantize_rows(x.reshape(-1, K))
                y = w4a8_matmul(
                    a_q, a_s, w.qp, w.gscale, block_n=blocks[0],
                    block_kp=blocks[1], out_dtype=x.dtype,
                    interpret=interpret,
                )
                return y.reshape(*lead, N)
        # Group scales do not commute with the contraction (groups live on
        # the contracted K axis), so the dq path must dequantize the weight
        # before the dot. Done per nibble PLANE as two einsums over
        # contiguous activation halves: the unpack+scale chain is then pure
        # elementwise into each dot operand (no concat on the contracted
        # axis, which XLA will not fuse through), keeping the bf16 weight
        # transient to at most one plane per projection. XLA may still
        # materialize the planes in HBM rather than fusing into the dot —
        # unverified on hardware; scripts/ubench_gemm.py's dq4 row measures
        # exactly this path.
        if w.qp.ndim == 2:
            N, Kp = w.qp.shape
            G, g = w.gscale.shape[-2], w.group_size
            lo, hi = unpack4(w.qp)
            swapped = _swap_weight_term(subscripts)

            def plane(p, g0):
                # Dequantize in bf16: int4 values and bf16 group scales are
                # both exact in bf16, so this costs <0.4 % rounding on the
                # product — while an f32 chain materializes 90 MB fp32 plane
                # temps per 7B projection, which OOMed the 16 GB chip under
                # the unrolled decode scan (results/r3_measure/bench_int4).
                dt = x.dtype if x.dtype != jnp.float32 else jnp.float32
                gs = w.gscale[g0:g0 + G // 2].astype(dt)  # [G/2, N]
                wf = p.astype(dt).reshape(N, G // 2, g)
                wf = wf * jnp.swapaxes(gs, 0, 1)[:, :, None]
                return wf.reshape(N, Kp).astype(x.dtype)

            return (
                jnp.einsum(swapped, x[..., :Kp], plane(lo, 0))
                + jnp.einsum(swapped, x[..., Kp:], plane(hi, G // 2))
            )
        return jnp.einsum(subscripts, x, dequantize4(w, x.dtype))
    if isinstance(w, QuantizedTensor):
        if impl == "w8a8" and w.q.ndim == 2:
            N, K = w.q.shape
            blocks = _w8a8_blocks(N, K)
            interpret = _s8_interpret()
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


def qmatmul_stacked(
    x, w_stacked, layer, subscripts: str, impl: str = "dq", a_pre=None
):
    """Layer-indexed einsum over STACKED ``[L, ...]`` maybe-quantized weights.

    For impl="w8a8"/"w4a8" this routes to the *_cached Pallas GEMMs
    (ops/gemm.py): the layer index rides scalar prefetch into the weight
    BlockSpec, so the kernel reads straight out of the stacked buffer.
    Feeding per-layer *slices* to the plain GEMMs instead makes XLA copy
    each layer's whole payload to stage the pallas operand — under the
    unrolled 7B decode loop the latency-hiding scheduler kept many ~45 MB
    copies alive and OOMed the 16 GB chip (round-4 bench_w8a8 postmortem).
    Ineligible shapes/impls fall back to slice + :func:`qmatmul` (the
    slice feeds an einsum, which XLA reads in place — no copy).

    ``a_pre``: optional pre-quantized activation ``(a_q [M, K] s8,
    a_scale [M, 1] f32)`` — shared across projections consuming the same
    activation (see :func:`s8_stacked_eligible`)."""
    if (
        impl == "w8a8"
        and isinstance(w_stacked, QuantizedTensor)
        and w_stacked.q.ndim == 3
    ):
        L, N, K = w_stacked.q.shape
        blocks = _w8a8_blocks(N, K)
        interpret = _s8_interpret()
        if blocks is not None and x.shape[-1] == K and interpret is not False:
            from hydragen_tpu.ops.gemm import quantize_rows, w8a8_matmul_cached

            lead = x.shape[:-1]
            a_q, a_s = a_pre if a_pre is not None else quantize_rows(
                x.reshape(-1, K)
            )
            y = w8a8_matmul_cached(
                layer, a_q, a_s, w_stacked.q, w_stacked.scale,
                block_n=blocks[0], block_k=blocks[1], out_dtype=x.dtype,
                interpret=interpret,
            )
            return y.reshape(*lead, N)
    if (
        impl == "w4a8"
        and isinstance(w_stacked, Quantized4Tensor)
        and w_stacked.qp.ndim == 3
    ):
        L, N, Kp = w_stacked.qp.shape
        K = 2 * Kp
        blocks = _w4a8_blocks(N, K, w_stacked.group_size)
        interpret = _s8_interpret()
        if blocks is not None and x.shape[-1] == K and interpret is not False:
            from hydragen_tpu.ops.gemm import quantize_rows, w4a8_matmul_cached

            lead = x.shape[:-1]
            a_q, a_s = a_pre if a_pre is not None else quantize_rows(
                x.reshape(-1, K)
            )
            y = w4a8_matmul_cached(
                layer, a_q, a_s, w_stacked.qp, w_stacked.gscale,
                block_n=blocks[0], block_kp=blocks[1], out_dtype=x.dtype,
                interpret=interpret,
            )
            return y.reshape(*lead, N)
    w_sliced = (
        jax.tree.map(lambda a: a[layer], w_stacked)
        if is_quantized_weight(w_stacked)
        else w_stacked[layer]
    )
    return qmatmul(x, w_sliced, subscripts, impl=impl)


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


def quantize_kv4(x: jax.Array):
    """x ``[..., d]`` float -> (UNPACKED int4 values in int8 ``[..., d]``,
    scale f32 ``[...]``). Same per-(token, head) symmetric scheme as
    :func:`quantize_kv` on a [-7, 7] grid. The nibble packing itself
    happens in the cache write paths along the TOKEN axis (core/cache.py:
    byte row j holds token j in its low nibble and token j + S/2 high):
    packing along head_dim would halve the minor dim to 64 and XLA's
    (8, 128) HBM tiling would pad it straight back — zero capacity or
    bandwidth win. Token-planar packing keeps tiles full; readers split
    the score dot into (low, high) plane dots concatenated on the OUTPUT
    s axis and the value dot into two contiguous contracted halves
    (ops/reference.py attention_bhsd kv_bits=4). Full-depth version of the
    reference's vestigial int4 KV path (xformers_stuff.py:431-530).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q4 = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int8)
    return q4, jnp.squeeze(scale, -1)


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")

# MLP intermediate-dim padding for quantized weights: the s8 GEMMs tile N
# in (512, 256, 128) and 7B's I=11008 only divides 256, costing ~2x the
# grid cells of the ubench's padded N=11264 (123 vs 100 us/call measured).
# Zero-padding gate/up's out dim and down's in dim is EXACT (silu(0)*0 = 0
# feeds zero rows of down) and costs +2.3 % weight bytes at 7B.
_I_PAD = 512


def pad_intermediate(layers: dict) -> dict:
    """Zero-pad the MLP intermediate dim of a (stacked) layer dict to a
    _I_PAD multiple. Called on FLOAT weights before quantization; tiny
    models (I < _I_PAD) are left alone."""
    I = layers["gate"].shape[-1]
    if I < _I_PAD or I % _I_PAD == 0:
        return layers
    pad = -I % _I_PAD
    out = dict(layers)
    out["gate"] = jnp.pad(layers["gate"], ((0, 0), (0, 0), (0, pad)))
    out["up"] = jnp.pad(layers["up"], ((0, 0), (0, 0), (0, pad)))
    out["down"] = jnp.pad(layers["down"], ((0, 0), (0, pad), (0, 0)))
    return out


def quantize_params(
    params: dict, quantize_lm_head: bool = True, bits: int = 8,
    pad_mlp: bool = False, bits4_families: tuple = (),
) -> dict:
    """Quantize the large projection matrices of a Llama param pytree.

    Embeddings stay high-precision (gather, not matmul); norms and biases are
    tiny. Per-layer matrices are stacked ``[L, in, out]`` — quantized with
    per-(layer, out-channel) scales (``bits=8``) or per-(layer, K-group,
    out-channel) scales (``bits=4``). Each tensor is quantized under jit so
    the fp32 intermediates fuse away instead of materializing in HBM — a 7B
    model must quantize within a 16 GB chip's headroom.

    ``bits=4`` keeps the lm_head at INT8: logits feed sampling directly and
    the head is the quality-critical matmul (same reasoning that pins it to
    the weight-only path under w8a8, core/engine.py).

    ``bits4_families`` quantizes the named projection families at INT4
    regardless of ``bits`` — the mixed decode-optimal layout (engine mode
    "mixed": int8 everywhere, int4 ``down``) from the measured M=256 GEMM
    ladder, where only the K-heavy down projection wins on the w4a8 kernel.
    """
    assert bits in (8, 4), bits
    quantize_jit = jax.jit(quantize, static_argnames=("axis",))
    quantize4_jit = jax.jit(quantize4, static_argnames=("group",))
    qfn = quantize4_jit if bits == 4 else (
        lambda w: quantize_jit(w, axis=-2)
    )
    out = dict(params)
    layers = dict(params["layers"])
    if pad_mlp:  # s8-GEMM N-tile alignment (see pad_intermediate)
        layers = pad_intermediate(layers)
    for k in _QUANT_KEYS:
        layers[k] = quantize4_jit(layers[k]) if k in bits4_families else qfn(layers[k])
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_jit(params["lm_head"], axis=-2)
    return out


def is_quantized_weight(x) -> bool:
    """INT8 or INT4 weight node (the decode-unroll / prefetch gates key on
    'weights are integer payloads', not on the specific bit width)."""
    return isinstance(x, (QuantizedTensor, Quantized4Tensor))
