"""Microbench: the decode unique-cache read at north-star shapes.

Compares the XLA commuted-scale path against Pallas decode kernels at the
exact 7B bs-256 decode shapes (q [256,32,1,128], KV int8 [256,64,32,128]
BSHD + f32 scales). VERDICT r2 item 1: this read runs at 2x its 163 us/layer
bandwidth floor on the XLA path — the round-3 target is a kernel that
streams at bandwidth.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from hydragen_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # TPU only: foreign-host CPU AOT entries can SIGILL

from hydragen_tpu.ops.reference import attention_bhsd
from hydragen_tpu.utils.timing import timed_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=32)
    ap.add_argument("--s", type=int, default=64)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--which", default="xla,rowdec,kv4,kv4xla")
    ap.add_argument("--rows", type=lambda s: [int(x) for x in s.split(",")],
                    default=[8])
    args = ap.parse_args()

    b, hq, hkv, s, d = args.b, args.hq, args.hkv, args.s, args.d
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (b, hq, 1, d), dtype=jnp.bfloat16)
    k8 = jax.random.randint(ks[1], (b, s, hkv, d), -127, 128, dtype=jnp.int8)
    v8 = jax.random.randint(ks[2], (b, s, hkv, d), -127, 128, dtype=jnp.int8)
    kscale = jax.random.uniform(ks[3], (b, s, hkv), dtype=jnp.float32) * 0.02
    vscale = jax.random.uniform(ks[4], (b, s, hkv), dtype=jnp.float32) * 0.02
    lens = jnp.full((b,), s, dtype=jnp.int32)

    payload_bytes = 2 * b * s * hkv * d + 4 * 2 * b * s * hkv
    floor_us = payload_bytes / 820e9 * 1e6
    print(f"payload {payload_bytes/1e6:.0f} MB -> bandwidth floor {floor_us:.0f} us @820GB/s")

    which = args.which.split(",")

    # NB: every timed op takes its KV tensors as ARGUMENTS (not closure
    # captures): closed-over arrays lower to HLO constants, and the axon
    # remote-compile endpoint rejects the resulting multi-hundred-MB request
    # body (HTTP 413). Arguments stay device-side parameters.
    if "xla" in which:
        def run_xla(q, k8, v8, kscale, vscale):
            return attention_bhsd(
                q, k8, v8, kv_seq_lens=lens, k_scale=kscale, v_scale=vscale,
                kv_bshd=True,
            )
        t = max(timed_scanned(run_xla, (q, k8, v8, kscale, vscale),
                              num_iters=args.iters), 1e-9)
        print(f"xla bshd commuted-scale: {t*1e6:9.1f} us  ({payload_bytes/t/1e9:.0f} GB/s)")

    if "bhsd" in which:
        kb = k8.transpose(0, 2, 1, 3)
        vb = v8.transpose(0, 2, 1, 3)
        ksb = kscale.transpose(0, 2, 1)
        vsb = vscale.transpose(0, 2, 1)

        def run_xla_bhsd(q, kb, vb, ksb, vsb):
            return attention_bhsd(
                q, kb, vb, kv_seq_lens=lens, k_scale=ksb, v_scale=vsb,
            )
        t = max(timed_scanned(run_xla_bhsd, (q, kb, vb, ksb, vsb),
                              num_iters=args.iters), 1e-9)
        print(f"xla bhsd commuted-scale: {t*1e6:9.1f} us  ({payload_bytes/t/1e9:.0f} GB/s)")

    if "kv4" in which or "kv4xla" in which:
        # INT4 token-planar pack: same LOGICAL workload, half the payload
        # bytes (plus the same scale bytes) — the read's bandwidth floor
        # halves; GB/s is reported against the PACKED traffic.
        assert s % 2 == 0
        k4 = jnp.clip(k8, -7, 7)
        v4 = jnp.clip(v8, -7, 7)

        def pack_s(x):
            lo = x[:, : s // 2].astype(jnp.int32)
            hi = x[:, s // 2:].astype(jnp.int32)
            return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)

        pk, pv = pack_s(k4), pack_s(v4)
        p4_bytes = payload_bytes // 2 + 4 * b * s * hkv
        print(f"int4 payload {p4_bytes/1e6:.0f} MB -> floor "
              f"{p4_bytes/820e9*1e6:.0f} us @820GB/s")

        if "kv4xla" in which:
            def run_kv4_xla(q, pk, pv, kscale, vscale):
                return attention_bhsd(
                    q, pk, pv, kv_seq_lens=lens, k_scale=kscale,
                    v_scale=vscale, kv_bshd=True, kv_bits=4,
                )
            t = max(timed_scanned(run_kv4_xla, (q, pk, pv, kscale, vscale),
                                  num_iters=args.iters), 1e-9)
            print(f"xla bshd int4:           {t*1e6:9.1f} us  "
                  f"({p4_bytes/t/1e9:.0f} GB/s packed)")

        if "kv4" in which:
            from hydragen_tpu.ops.decode import (
                chunk_kv_scales, decode_attention_cached,
            )

            ks_f = chunk_kv_scales(kscale, hkv).reshape(b, s * hkv)
            vs_f = chunk_kv_scales(vscale, hkv).reshape(b, s * hkv)
            for R in args.rows:
                if b % R:
                    continue

                def run_kv4(q, pk, pv, ks_f, vs_f, R=R):
                    return decode_attention_cached(
                        jnp.int32(0), q, pk[None], pv[None],
                        kv_seq_lens=lens, k_scale_all=ks_f[None],
                        v_scale_all=vs_f[None], row_batch=R, kv_bits=4,
                    )
                try:
                    t = max(timed_scanned(run_kv4, (q, pk, pv, ks_f, vs_f),
                                          num_iters=args.iters),
                            1e-9)
                except Exception as e:  # e.g. VMEM OOM at this R — next arm
                    print(f"pallas int4 R={R:<3d}:       FAILED "
                          f"({type(e).__name__}: {str(e)[:120]})")
                    continue
                print(f"pallas int4 R={R:<3d}:       {t*1e6:9.1f} us  "
                      f"({p4_bytes/t/1e9:.0f} GB/s packed)")

    if "rowdec" in which:
        from hydragen_tpu.ops.decode import chunk_kv_scales, decode_attention_bshd

        ksc_c = jax.block_until_ready(chunk_kv_scales(kscale, hkv))
        vsc_c = jax.block_until_ready(chunk_kv_scales(vscale, hkv))

        for R in args.rows:
            if b % R:
                continue

            def run_rowdec(q, k8, v8, ksc_c, vsc_c, R=R):
                return decode_attention_bshd(
                    q, k8, v8, kv_seq_lens=lens, k_scale=ksc_c, v_scale=vsc_c,
                    scales_chunked=True, row_batch=R,
                )
            try:
                o1, l1 = run_rowdec(q, k8, v8, ksc_c, vsc_c)
                o0, l0 = attention_bhsd(
                    q, k8, v8, kv_seq_lens=lens, k_scale=kscale, v_scale=vscale,
                    kv_bshd=True,
                )
                od = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o0.astype(jnp.float32))))
                ld = float(jnp.max(jnp.abs(l1 - l0)))
                t = max(timed_scanned(run_rowdec, (q, k8, v8, ksc_c, vsc_c),
                                      num_iters=args.iters),
                        1e-9)
            except Exception as e:  # e.g. VMEM OOM at this R — next arm
                print(f"pallas rowdec R={R:<3d}:     FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})")
                continue
            print(f"pallas rowdec R={R:<3d}:     {t*1e6:9.1f} us  "
                  f"({payload_bytes/t/1e9:.0f} GB/s)  dout={od:.4f} dlse={ld:.5f}")


if __name__ == "__main__":
    main()
