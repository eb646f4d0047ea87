"""70B geometry + multi-level prefix tree on the CPU mesh.

BASELINE.md tracks "Llama-2-70B multi-host TP with multi-level prefix
tree" as a target config. This executes a scaled-depth engine with the
REAL llama-2-70b per-layer dims — hidden 8192, 64 q / 8 kv heads,
head_dim 128, intermediate 28672 — through ``generate`` with a THREE-level
shared tree (system prompt -> 2 sub-prompts -> 4 leaf prompts -> 2 samples
each) over a (dp=2, tp=4) mesh, asserting token parity with the unsharded
engine. The dp x tp mesh is the single-process stand-in for the 2-host
layout (docs/deployment.md: real multi-host swaps in
``jax.distributed.initialize`` + the same NamedShardings).

Reference anchor: the reference supports arbitrary stack depth via
repeated append_shared (/root/reference/hydragen/llama.py:1006-1051); its
hierarchy ablation is 2-level only — 3 levels exercises the general tree.
"""

import dataclasses
import functools
import gc

import numpy as np

import tests.conftest  # noqa: F401

import jax

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import PRESETS
from hydragen_tpu.parallel import make_mesh


@functools.lru_cache(maxsize=1)
def _cfg70():
    base = PRESETS["llama-2-70b"]
    assert base.hidden_size == 8192 and base.num_attention_heads == 64
    assert base.num_key_value_heads == 8 and base.intermediate_size == 28672
    return dataclasses.replace(base, num_hidden_layers=2, dtype="float32")


def _run(mesh):
    from hydragen_tpu.models.llama import init_params

    cfg = _cfg70()
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = HydragenLlama(cfg, params, mesh=mesh)
    eng.setup_caches(
        max_unique_batch_size=8,
        max_unique_seq_length=16,
        max_shared_batch_sizes=[1, 2, 4],
        max_shared_seq_lengths=[48, 24, 12],
    )
    rng = np.random.RandomState(0)
    tree = [
        rng.randint(1, 1000, (1, 48)).astype(np.int32),   # system prompt
        rng.randint(1, 1000, (2, 24)).astype(np.int32),   # 2 sub-prompts
        rng.randint(1, 1000, (4, 12)).astype(np.int32),   # 4 leaves
        rng.randint(1, 1000, (8, 4)).astype(np.int32),    # per-seq suffixes
    ]
    out = np.asarray(eng.generate(
        input_ids=tree,
        num_return_sequences=1,
        max_new_tokens=3,
        temperature=0.0,
        shared_cache_op=SharedCacheOp.WIPE,
    ))
    del eng, params
    gc.collect()
    return out


from tests.conftest import needs_cores


@needs_cores(2)
def test_70b_geometry_tree_tp_parity():
    ref = _run(None)
    assert ref.shape == (8, 3)
    out = _run(make_mesh(tp=4, dp=2))
    assert (out == ref).all(), f"(dp=2, tp=4) diverged: {out} vs {ref}"
