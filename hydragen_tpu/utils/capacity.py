"""HBM capacity accounting shared by the pre-flight fit checks.

One estimator instead of per-script copies (bench.py and scripts/synth.py
previously each priced weights; the copies diverged the moment INT4
landed). Numbers are device-resident BYTES, not traffic — see
docs/results_v5e.md for the bandwidth roofline.
"""

from __future__ import annotations

from hydragen_tpu.models.config import ModelConfig

# v5e: 16 GB minus runtime/program/activation headroom.
HBM_BYTES = 15.2e9


def param_bytes(cfg: ModelConfig, quant) -> int:
    """Device bytes of the parameter pytree under a quantization mode.

    quant: None/"" (bf16), "int8"/"w8a8" (int8 payload + bf16 channel
    scales), or "int4"/"w4a8" (nibble-packed payload + bf16 group scales,
    group 128; lm_head stays INT8 — ops/quant.py quantize_params).
    """
    I = cfg.intermediate_size
    if quant in ("w8a8", "w4a8"):
        # s8-GEMM modes pad I to a 512 multiple for 512-wide N tiles
        # (ops/quant.py pad_intermediate) — price the padding.
        from hydragen_tpu.ops.quant import _I_PAD

        if I >= _I_PAD:
            I = -(-I // _I_PAD) * _I_PAD
    per_layer = (
        4 * cfg.hidden_size * cfg.hidden_size
        + 3 * cfg.hidden_size * I
    )
    body = per_layer * cfg.num_hidden_layers
    head = cfg.hidden_size * cfg.vocab_size
    embed = cfg.vocab_size * cfg.hidden_size * 2  # bf16 (gather table)
    if quant in ("int4", "w4a8"):
        return int(body * (0.5 + 2 / 128)) + head + embed
    w = 1 if quant else 2
    return (body + head) * w + embed
