from hydragen_tpu.core.cache import KVCache, SharedLevel, allocate_cache
from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp

__all__ = ["KVCache", "SharedLevel", "allocate_cache", "HydragenLlama", "SharedCacheOp"]
