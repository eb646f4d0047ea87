"""Probe the decode-step layout assignment at the 7B bs256 kv4 geometry.

The sweep's bs256/ns1024 cell OOMs on two full relayout copies of the int4
unique cache into {4,3,1,2,0} (B inner of the token dim) — reproduce the
layout choice at a 4-layer truncation of the 7B config (layout assignment
is per-buffer-shape, not per-L) where the program fits, and print every
copy of / layout on the cache buffers so fixes can be iterated without
10-minute OOM compiles. Usage: python scripts/probe_layout.py [ns]
"""

import dataclasses
import re
import sys

import numpy as np

from hydragen_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from hydragen_tpu.core.engine import HydragenLlama, SharedCacheOp
from hydragen_tpu.models.config import PRESETS
from hydragen_tpu.models.llama import init_params

import jax

ns = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
bs, nu = 256, 128

cfg = dataclasses.replace(PRESETS["llama-2-7b"], num_hidden_layers=4)
params = init_params(cfg, jax.random.PRNGKey(0), quantized="w8a8")
eng = HydragenLlama(cfg, params, quantization="w8a8")
eng.setup_caches(
    max_unique_batch_size=bs,
    max_unique_seq_length=nu + 8,
    max_shared_batch_sizes=[1],
    max_shared_seq_lengths=[ns],
    kv_quant="int4",
    shared_kv_quant="follow",
)
rng = np.random.RandomState(0)
prompt = rng.randint(1, cfg.vocab_size, size=(1, ns)).astype(np.int32)

# Trigger prefill + decode compile exactly like the sweep cell.
out = eng.generate(
    input_ids=[prompt], num_return_sequences=bs, max_new_tokens=4,
    temperature=0.0, shared_cache_op=SharedCacheOp.WIPE,
)
print("generate ok", getattr(out, "token_ids", out).shape)

print("(re)compiling decode step for HLO text...")
spec = eng._spec("decode", unique_history=True)
import jax.numpy as jnp

from hydragen_tpu.core.engine import _decode_steps as dstep

toks = jnp.ones((bs, 1), jnp.int32)
start = jnp.full((bs,), ns, jnp.int32)
upos = jnp.full((bs,), 0, jnp.int32)
rngk = jax.random.PRNGKey(0)
overrides = jnp.zeros((4, bs), jnp.int32)
lowered = dstep.lower(
    eng.params, eng.cache, toks, start, upos, rngk, overrides,
    cfg, spec, 4, 0.0, None, False, False, uniform_pos=True, mesh=None,
)
txt = lowered.compile().as_text()
pat = re.compile(r".*(copy|fusion|custom-call|dynamic-update-slice|parameter|get-tuple-element).*s8\[4,256,\d+,32,128\].*")
seen = set()
for line in txt.splitlines():
    if re.search(r"s8\[4,256,\d+,32,128\]", line):
        sig = line.strip()[:220]
        if sig not in seen:
            seen.add(sig)
            print(sig)
