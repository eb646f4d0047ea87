"""Microbench: W8A8 Pallas GEMM vs the bf16 matmul floor at decode shapes.

The decision experiment for breaking the north-star matmul floor
(docs/results_v5e.md roofline: ~20 ms/step of bf16 MXU time at 7B bs 256;
v5e int8 peak is ~2x bf16). Three contenders per shape:

  bf16   — XLA bf16 matmul (today's floor; int8 weights convert to bf16)
  dq     — XLA int8-weight dequant-fused bf16 matmul (the engine's qmatmul)
  w8a8   — Pallas native s8xs8 -> i32 GEMM (ops/gemm.py), incl. the
           per-row activation quantize in the timed region (it is part of
           the real cost of switching).

Shapes: the 7B decode GEMMs at bs 256 (M=256): qkv/o [4096x4096],
gate/up [4096->11008], down [11008->4096], lm_head [4096->32000].
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from hydragen_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # TPU only: foreign-host CPU AOT entries can SIGILL

from hydragen_tpu.ops.gemm import quantize_rows, w8a8_matmul
from hydragen_tpu.utils.timing import timed_scanned

SHAPES = {  # name: (K, N)
    "qkv_o": (4096, 4096),
    "gate_up": (4096, 11008),
    "down": (11008, 4096),
    "lm_head": (4096, 32000),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--which", default="bf16,dq,w8a8,w4a8,dq4")
    ap.add_argument("--shapes", default=",".join(SHAPES))
    ap.add_argument("--block-n", type=int, default=512)
    ap.add_argument("--block-k", type=int, default=1024)
    args = ap.parse_args()

    M = args.m
    which = args.which.split(",")
    key = jax.random.PRNGKey(0)

    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        Np = -(-N // args.block_n) * args.block_n  # pad N (lm_head 32000)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (M, K), dtype=jnp.bfloat16)
        w8 = jax.random.randint(ks[1], (Np, K), -127, 128, dtype=jnp.int8)
        wscale = (jax.random.uniform(ks[2], (Np,), dtype=jnp.float32) * 0.02
                  ).astype(jnp.bfloat16)
        wbf = (w8.astype(jnp.bfloat16) * wscale[:, None])

        flops = 2 * M * K * Np
        print(f"== {name}: M={M} K={K} N={Np}  ({flops/1e9:.1f} GFLOP)")

        def guard(t):
            # Differenced elapsed can come out <= 0 on a noisy tunnel; clamp
            # and flag rather than dividing by zero (same as ubench_unique).
            if t <= 0:
                print("  (!) non-positive elapsed clamped — rerun this arm")
                return 1e-9
            return t

        # Weights are passed as ARGUMENTS to the timed op: closure-captured
        # arrays lower to HLO constants and the axon remote-compile endpoint
        # rejects the resulting request body (HTTP 413) at lm_head size.
        if "bf16" in which:
            def run_bf16(x, wbf):
                return jnp.einsum("mk,nk->mn", x, wbf,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
            t = guard(timed_scanned(run_bf16, (x, wbf), num_iters=args.iters))
            print(f"  bf16 : {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} TFLOP/s)")

        if "dq" in which:
            def run_dq(x, w8, wscale):
                # Tie the payload to the perturbed input: the dequant chain
                # is otherwise loop-invariant inside timed_scanned's scan
                # and XLA hoists it, under-reporting the path's real cost
                # (the engine re-reads + converts the payload every step).
                dep = (x[0, 0] * 0).astype(jnp.int8)
                w = (w8 + dep).astype(jnp.bfloat16) * wscale[:, None]
                return jnp.einsum("mk,nk->mn", x, w,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
            t = guard(timed_scanned(run_dq, (x, w8, wscale),
                                    num_iters=args.iters))
            print(f"  dq   : {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} TFLOP/s)")

        if "w8a8" in which:
            bn = next(b for b in (args.block_n, 512, 256, 128) if Np % b == 0)
            bk = next(b for b in (args.block_k, 1024, 512, 256, 128)
                      if K % b == 0)

            def run_w8a8(x, w8, wscale):
                a_q, a_s = quantize_rows(x)
                return w8a8_matmul(a_q, a_s, w8, wscale,
                                   block_n=bn, block_k=bk)
            t = guard(timed_scanned(run_w8a8, (x, w8, wscale),
                                    num_iters=args.iters))
            print(f"  w8a8 : {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} TOP/s "
                  "incl. row quantize)")

        if ("w4a8" in which or "dq4" in which) and K % 256 == 0:
            from hydragen_tpu.ops.gemm import w4a8_matmul
            from hydragen_tpu.ops.quant import (
                Quantized4Tensor, dequantize4, pick_group4,
            )

            g = pick_group4(K)
            t4 = Quantized4Tensor(
                qp=jax.random.randint(ks[3], (Np, K // 2), -128, 128,
                                      dtype=jnp.int8),
                gscale=(jax.random.uniform(ks[2], (K // g, Np),
                                           dtype=jnp.float32) * 0.02
                        ).astype(jnp.bfloat16),
            )
            if "w4a8" in which:
                bkp = next((b for b in (512, 256, 128)
                            if (K // 2) % b == 0 and b % g == 0), None)
                if bkp is None:
                    print("  w4a8 : skipped (no Mosaic tiling for K)")
                else:
                    bn = next(b for b in (args.block_n, 512, 256, 128)
                              if Np % b == 0)

                    def run_w4a8(x, qp, gscale):
                        a_q, a_s = quantize_rows(x)
                        return w4a8_matmul(a_q, a_s, qp, gscale,
                                           block_n=bn, block_kp=bkp)
                    t = guard(timed_scanned(run_w4a8, (x, t4.qp, t4.gscale),
                                            num_iters=args.iters))
                    print(f"  w4a8 : {t*1e6:9.1f} us  "
                          f"({flops/t/1e12:6.1f} TOP/s incl. row quantize)")
            if "dq4" in which:
                def run_dq4(x, qp, gscale):
                    dep = (x[0, 0] * 0).astype(jnp.int8)  # defeat hoisting
                    w = dequantize4(t4._replace(qp=qp + dep, gscale=gscale))
                    return jnp.einsum("mk,kn->mn", x, w,
                                      preferred_element_type=jnp.float32
                                      ).astype(jnp.bfloat16)
                t = guard(timed_scanned(run_dq4, (x, t4.qp, t4.gscale),
                                        num_iters=args.iters))
                print(f"  dq4  : {t*1e6:9.1f} us  ({flops/t/1e12:6.1f} "
                      "TFLOP/s, XLA int4 group-dequant)")


if __name__ == "__main__":
    main()
