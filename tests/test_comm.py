"""Collective surface of the sharded decode step (compiled-HLO census).

BASELINE.md demands >=85 % scaling efficiency to 2 hosts; hardware is not
reachable in CI, so the honest substitute is (a) a comm-volume roofline in
docs/deployment.md and (b) THIS test, which compiles the sharded decode
step and counts its collectives so the documented model cannot silently
drift from the program XLA actually emits.

Reference contract being mirrored: exactly 2 all-reduces per layer under
TP (the forward hooks after attention and the MLP,
/root/reference/hydragen/tp.py:84-112). Here GSPMD derives the same two
from the row-sharded o/down projections; they sit inside the scanned layer
body (one textual occurrence, executed once per layer per step).
"""

import re

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from hydragen_tpu.core.engine import HydragenLlama
from hydragen_tpu.models.config import ModelConfig
from hydragen_tpu.models.llama import (
    init_params,
    logits_from_hidden,
    model_forward,
)
from hydragen_tpu.parallel import make_mesh

CFG = ModelConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=8,
    num_key_value_heads=4,
    dtype="float32",
)

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def count_collectives(txt: str) -> dict:
    """Census of collective ops in compiled HLO text (sync + async forms)."""
    return {
        op: len(re.findall(rf"= (?:\S+ )?{op}(?:-start)?\(", txt))
        for op in COLLECTIVES
    }


def _compiled_decode_step_hlo(mesh):
    params = init_params(CFG, jax.random.PRNGKey(0))
    eng = HydragenLlama(CFG, params, mesh=mesh)
    eng.setup_caches(8, 32, [1], [64])
    rng = np.random.RandomState(0)
    eng.append_shared(rng.randint(1, 255, (1, 64)).astype(np.int32))
    spec = eng._spec("decode", unique_history=True)

    def step(params, cache, tok, pos, upos):
        hidden, _, _ = model_forward(
            params, CFG, cache, tok, pos, upos, spec,
            history_lens=upos[:, 0], mesh=mesh,
        )
        return logits_from_hidden(params, CFG, hidden)

    tok = jnp.ones((8, 1), jnp.int32)
    pos = jnp.full((8, 1), 70, jnp.int32)
    upos = jnp.full((8, 1), 4, jnp.int32)
    return (
        jax.jit(step)
        .lower(eng.params, eng.cache, tok, pos, upos)
        .compile()
        .as_text()
    )


@pytest.mark.parametrize(
    "tp,dp,sp",
    [(2, 1, 1), (2, 2, 2), (2, 1, 4)],
    ids=["tp2", "dp2sp2tp2", "sp4tp2"],
)
def test_decode_step_collective_surface(tp, dp, sp):
    """The compiled sharded decode step must contain exactly the two
    per-layer all-reduces of the TP contract (tp.py:84-112) and NOTHING
    else: dp adds no forward collectives (the basis of the documented
    2-host dp scaling projection, docs/deployment.md), and sp's LSE merge
    folds into the same all-reduce surface at decode scale."""
    if jax.device_count() < tp * dp * sp:
        pytest.skip("not enough devices")
    counts = count_collectives(_compiled_decode_step_hlo(make_mesh(tp=tp, dp=dp, sp=sp)))
    assert counts["all-reduce"] == 2, counts
    for op in ("all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        assert counts[op] == 0, counts


def test_decode_step_unsharded_has_no_collectives():
    counts = count_collectives(_compiled_decode_step_hlo(None))
    assert all(v == 0 for v in counts.values()), counts
