"""shard_map wrappers: Pallas attention kernels under a (dp, sp, tp) mesh.

A ``pallas_call`` is an opaque custom call the GSPMD partitioner cannot
split, so round 2 forced every sharded attention onto the XLA path — losing
the measured kernel wins (1.7-2.2x at long prefill, in-register int8-KV
dequant) exactly where the reference produces its TP=8 headline numbers
(flash kernels run *under* TP there, /root/reference/hydragen/tp.py:84-112
+ flash.py:163-350). These wrappers restore the kernels by running them
per-shard inside ``shard_map`` and merging sequence-parallel partials with
the exact LSE math ("distributed split-K" — the same ``combine_lse``
algebra, applied across the ``sp`` axis with psum/pmax collectives).

Sharding contract (matches parallel/sharding.py):
- q ``[b, hq, m, d]``: batch over ``dp``, heads over ``tp``.
- shared level KV ``[sb, hkv, S, d]``: heads over ``tp``, sequence over
  ``sp``, replicated over ``dp``.
- causal self-attention KV ``[b, hkv, t, d]``: batch over ``dp``, heads
  over ``tp``.

Inter-sequence batching (the query fold) happens INSIDE the shard body: the
fold mixes the dp-sharded batch into the matmul M dimension, which would
force GSPMD resharding if done outside.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        # jax>=0.8 renamed check_rep -> check_vma (same meaning here: the
        # bodies use collectives, so replication checking must be off).
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name] if name in mesh.axis_names else 1


def mesh_attention_eligible(
    mesh: Optional[Mesh], b: int, hq: int, hkv: int, sb: int, s: int
) -> bool:
    """Can the shard_map'd kernel path handle these shapes on this mesh?"""
    if mesh is None:
        return False
    dp, sp, tp = (_axis_size(mesh, n) for n in ("dp", "sp", "tp"))
    if b % dp or s % sp:
        return False
    if hq % tp or hkv % tp:
        return False
    # The local fold needs each dp shard to hold whole multiples of sb.
    if (b // dp) % sb:
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "causal", "interpret"),
)
def sharded_level_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_seq_lens: Optional[jax.Array],
    *,
    mesh: Mesh,
    causal: bool = False,
    interpret: Optional[bool] = None,
):
    """Folded shared-level attention on the Pallas kernel, under the mesh.

    Args:
        q: ``[b, hq, m, d]`` (dp, tp, None, None).
        k, v: ``[sb, hkv, S, d]`` (None, tp, sp, None) — a shared level
            (may be an ``(int8 payload, f32 scale)`` pair; scales
            ``[sb, hkv, S]`` shard (None, tp, sp)).
        kv_seq_lens: ``[sb]`` global lengths (replicated) or None.

    Returns:
        (out ``[b, hq, m, d]``, lse ``[b, hq, m]`` f32) — partials over this
        level, merged across ``sp`` (exact LSE merge), still dp/tp-sharded.
    """
    from hydragen_tpu.ops.flash import flash_attention_bhsd

    k, ks = k if isinstance(k, tuple) else (k, None)
    v, vs = v if isinstance(v, tuple) else (v, None)
    quantized = ks is not None

    b, hq, m, d = q.shape
    sb, hkv, S, _ = k.shape
    sp = _axis_size(mesh, "sp")
    S_loc = S // sp
    if kv_seq_lens is None:
        kv_seq_lens = jnp.full((sb,), S, dtype=jnp.int32)

    def body(q, k, v, lens, ks=None, vs=None):
        # Local fold: [b_loc, hq_loc, m, d] -> [sb, hq_loc, sps_loc*m, d].
        b_loc, hq_loc = q.shape[0], q.shape[1]
        sps_loc = b_loc // sb
        qf = (
            q.reshape(sb, sps_loc, hq_loc, m, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(sb, hq_loc, sps_loc * m, d)
        )
        # This sp shard covers global rows [i*S_loc, (i+1)*S_loc).
        i = jax.lax.axis_index("sp")
        local_lens = jnp.clip(lens - i * S_loc, 0, S_loc)
        o, l = flash_attention_bhsd(
            qf, k, v, causal=causal, kv_seq_lens=local_lens,
            k_scale=ks, v_scale=vs, interpret=interpret,
        )
        if sp > 1:
            # Exact LSE merge across the sequence shards (combine_lse math
            # with psum/pmax; fully-masked shards carry lse = -inf).
            lf = l.astype(jnp.float32)
            mx = jax.lax.pmax(lf, "sp")
            mx_safe = jnp.maximum(mx, -1e30)
            w = jnp.exp(lf - mx_safe)
            num = jax.lax.psum(o.astype(jnp.float32) * w[..., None], "sp")
            den = jax.lax.psum(w, "sp")
            den_safe = jnp.where(den == 0.0, 1.0, den)
            o = (num / den_safe[..., None]).astype(q.dtype)
            l = jnp.where(den == 0.0, -jnp.inf, mx_safe + jnp.log(den_safe))
        # Local unfold back to [b_loc, hq_loc, m, d].
        o = (
            o.reshape(sb, hq_loc, sps_loc, m, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b_loc, hq_loc, m, d)
        )
        l = (
            l.reshape(sb, hq_loc, sps_loc, m)
            .transpose(0, 2, 1, 3)
            .reshape(b_loc, hq_loc, m)
        )
        return o, l

    q_spec = P("dp", "tp", None, None)
    kv_spec = P(None, "tp", "sp", None)
    out_specs = (q_spec, P("dp", "tp", None))
    lens32 = kv_seq_lens.astype(jnp.int32)
    if quantized:
        sc_spec = P(None, "tp", "sp")
        out, lse = shard_map(
            body,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, P(None), sc_spec, sc_spec),
            out_specs=out_specs,
            check_rep=False,
        )(q, k, v, lens32, ks, vs)
    else:
        out, lse = shard_map(
            body,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, P(None)),
            out_specs=out_specs,
            check_rep=False,
        )(q, k, v, lens32)
    return out, lse


@functools.partial(jax.jit, static_argnames=("mesh", "interpret"))
def sharded_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    interpret: Optional[bool] = None,
):
    """Causal self-attention on the Pallas kernel under (dp, tp).

    q ``[b, hq, t, d]`` / k, v ``[b, hkv, t, d]``, batch over dp, heads over
    tp. No sequence axis: the current input's KV is never sp-sharded.
    """
    from hydragen_tpu.ops.flash import flash_attention_bhsd

    def body(q, k, v):
        return flash_attention_bhsd(q, k, v, causal=True, interpret=interpret)

    q_spec = P("dp", "tp", None, None)
    out, lse = shard_map(
        body,
        mesh=mesh,
        in_specs=(q_spec, q_spec, q_spec),
        out_specs=(q_spec, P("dp", "tp", None)),
        check_rep=False,
    )(q, k, v)
    return out, lse
