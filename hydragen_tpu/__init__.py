"""hydragen-tpu: a TPU-native shared-prefix LLM inference engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ScalingIntelligence/hydragen (exact shared-prefix attention decomposition with
inter-sequence batching and hierarchical sharing), redesigned for TPU:

- Pallas flash-attention kernels returning ``(out, lse)`` (replacing the
  reference's flash-attn CUDA + Triton split-K kernels).
- A functional JAX Llama stack with static-shape KV caches under ``jax.jit``
  (replacing CUDA graphs: specialization is keyed on the same static
  attributes the reference's graph wrapper checks).
- ICI/DCN tensor parallelism via ``jax.sharding`` meshes (replacing NCCL).
"""

from hydragen_tpu.ops.combine import combine_lse
from hydragen_tpu.ops.hydragen import hydragen_attention
from hydragen_tpu.ops.reference import attention_with_lse
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp

__version__ = "0.1.0"

__all__ = [
    "combine_lse",
    "hydragen_attention",
    "attention_with_lse",
    "ModelConfig",
    "HydragenLlama",
    "SharedCacheOp",
]
