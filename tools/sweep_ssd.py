"""Microbenchmark the chunked SSD op on TPU at l32-ssd mixer shapes.

Usage: python tools/sweep_ssd.py [--rows 256] [--L 512] [--chunk 128 ...]
Times ssd_chunked alone (jitted, scalar-readback fenced) so layout/dtype
changes can be iterated without full-model compiles.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)  # 128 windows RC-folded
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--H", type=int, default=32)
    ap.add_argument("--P", type=int, default=64)
    ap.add_argument("--NG", type=int, default=1)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--chunks", type=int, nargs="*", default=[128])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.impl == "pallas":
        from plantcaduceus_tpu.ops.pallas_ssd import ssd_pallas as ssd_chunked
    else:
        from plantcaduceus_tpu.ops.ssd import ssd_chunked

    rng = np.random.default_rng(0)
    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    G, B, L, H, P, NG, N = 2, args.rows, args.L, args.H, args.P, args.NG, args.N
    x = jnp.asarray(rng.standard_normal((G, B, L, H, P)), dt_)
    dt = jnp.asarray(rng.standard_normal((G, B, L, H)) * 0.5 - 1.0, dt_)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, H)) * 0.5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, NG, N)), dt_)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, NG, N)), dt_)
    Ds = jnp.asarray(rng.standard_normal((G, H)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, H)) * 0.3, jnp.float32)

    for chunk in args.chunks:
        # Chain the op inside one jit (output feeds the next input) so the
        # per-call relay dispatch+readback overhead (~50 ms here) amortises.
        def fn_body(x):
            def body(_, carry):
                return ssd_chunked(carry, dt, A, Bm, Cm, Ds, dt_bias=dtb,
                                   chunk=chunk, directions=(False, True))
            return jnp.sum(jax.lax.fori_loop(0, args.iters, body, x)
                           .astype(jnp.float32))

        fn = jax.jit(fn_body)
        val = float(fn(x))  # compile + fence
        t0 = time.time()
        val = float(fn(x))
        dt_s = (time.time() - t0) / args.iters
        # FLOP model: GBC T*N + intra T*P + states N*P + inter N*P per tok/head
        mac_tok = (chunk * N * NG / H + chunk * P + 2 * N * P) * H
        tf = 2 * mac_tok * G * B * L / dt_s / 1e12
        print(json.dumps({"chunk": chunk, "ms": round(dt_s * 1e3, 2),
                          "tflops": round(tf, 1), "check": round(val, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
