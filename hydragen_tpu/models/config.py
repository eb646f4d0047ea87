"""Model configuration for the Llama family.

Stands in for the HuggingFace ``LlamaConfig`` the reference leans on
(``/root/reference/hydragen/llama.py:1-10``), but as a frozen dataclass that
is hashable (usable as a static jit argument) and backend-agnostic.
Covers Llama 2/3, CodeLlama, Yi, and Sheared-LLaMA — the reference's model
families (reference README.md:59).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    # RoPE scaling: None, ("linear"|"dynamic", factor) — the reference's
    # vanilla / linear / dynamic-NTK variants (llama.py:716-741) — or
    # ("llama3", factor, low_freq_factor, high_freq_factor,
    #  original_max_position_embeddings) for Llama-3.1-style frequency
    # smoothing (beyond the reference, which predates it).
    rope_scaling: Optional[Tuple] = None
    attention_bias: bool = False
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jax_dtype(self):
        return _DTYPES[self.dtype]

    @classmethod
    def from_hf_config(cls, hf_config, dtype: str = "bfloat16") -> "ModelConfig":
        """Build from a transformers LlamaConfig (or compatible)."""
        scaling = getattr(hf_config, "rope_scaling", None)
        if scaling is not None:
            stype = scaling.get("type", scaling.get("rope_type"))
            if stype == "llama3":
                scaling = (
                    stype,
                    float(scaling["factor"]),
                    float(scaling.get("low_freq_factor", 1.0)),
                    float(scaling.get("high_freq_factor", 4.0)),
                    int(scaling.get("original_max_position_embeddings", 8192)),
                )
            elif stype in ("default", None):
                scaling = None
            else:
                scaling = (stype, float(scaling["factor"]))
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=getattr(
                hf_config, "num_key_value_heads", hf_config.num_attention_heads
            ),
            rms_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_scaling=scaling,
            attention_bias=getattr(hf_config, "attention_bias", False),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            dtype=dtype,
        )


# Known configs for the reference's tracked model families (BASELINE.md).
PRESETS = {
    "sheared-llama-1.3b": ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5504,
        num_hidden_layers=24, num_attention_heads=16, num_key_value_heads=16,
        rms_norm_eps=1e-5, max_position_embeddings=4096,
    ),
    "llama-2-7b": ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
    ),
    "llama-2-13b": ModelConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=40, num_attention_heads=40, num_key_value_heads=40,
    ),
    "codellama-7b": ModelConfig(
        vocab_size=32016, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        rope_theta=1000000.0, max_position_embeddings=16384,
    ),
    "codellama-13b": ModelConfig(
        vocab_size=32016, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=40, num_attention_heads=40, num_key_value_heads=40,
        rope_theta=1000000.0, max_position_embeddings=16384,
    ),
    # The reference's sweep workhorse (docs/sweeps_from_paper.md:44-47). On a
    # 16 GB v5e this needs int8 weights (~33 GB bf16 -> ~17 GB) *and* TP >= 2;
    # single-chip bring-up uses TP over the 8 GQA kv-heads + int8 KV.
    "codellama-34b": ModelConfig(
        vocab_size=32016, hidden_size=8192, intermediate_size=22016,
        num_hidden_layers=48, num_attention_heads=64, num_key_value_heads=8,
        rope_theta=1000000.0, max_position_embeddings=16384,
    ),
    "yi-6b-200k": ModelConfig(
        vocab_size=64000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=4,
        rms_norm_eps=1e-5, rope_theta=5000000.0, max_position_embeddings=200000,
    ),
    "llama-2-70b": ModelConfig(
        vocab_size=32000, hidden_size=8192, intermediate_size=28672,
        num_hidden_layers=80, num_attention_heads=64, num_key_value_heads=8,
    ),
    "llama-3-8b": ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        rope_theta=500000.0, max_position_embeddings=8192,
    ),
    # Llama-3.2 small GQA models (fit a single 16 GB v5e comfortably; note
    # head_dim = hidden/heads = 64 for 1B).
    "llama-3.2-1b": ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        rope_theta=500000.0, max_position_embeddings=131072,
        rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192),
        tie_word_embeddings=True,
    ),
    "llama-3.2-3b": ModelConfig(
        vocab_size=128256, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=28, num_attention_heads=24, num_key_value_heads=8,
        rope_theta=500000.0, max_position_embeddings=131072,
        rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192),
        tie_word_embeddings=True,
    ),
}
