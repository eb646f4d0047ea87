from hydragen_tpu.ops.combine import combine_lse
from hydragen_tpu.ops.hydragen import hydragen_attention
from hydragen_tpu.ops.reference import attention_with_lse

__all__ = ["combine_lse", "hydragen_attention", "attention_with_lse"]
