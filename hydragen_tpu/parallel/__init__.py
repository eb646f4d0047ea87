"""Device-mesh parallelism for hydragen-tpu.

TPU-native replacement for the reference's NCCL tensor parallelism
(``/root/reference/hydragen/tp.py``, ``utils.py:87-133``): instead of mutating
modules in place and registering all-reduce hooks, parameters and KV caches
are placed on a ``jax.sharding.Mesh`` with ``NamedSharding``s and XLA's GSPMD
partitioner inserts the collectives (the two per-layer all-reduces of the
reference fall out of the row-sharded o/down projections automatically, and
ride ICI).
"""

from hydragen_tpu.parallel.mesh import make_mesh
from hydragen_tpu.parallel.sharding import (
    cache_pspecs,
    param_pspecs,
    shard_cache,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_pspecs",
    "cache_pspecs",
    "shard_params",
    "shard_cache",
]
