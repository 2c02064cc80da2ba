"""Sweep fused-mixer tile sizes (bl, bd) per d_inner on the real chip.

The inference hot loop is ops/pallas_mixer.mixer_scan_fused (one call per
direction per layer); this times the raw kernel across tile candidates at a
given model's shapes so the per-size defaults (VERDICT r1 #4: l28/l32
retune) are measured, not guessed.

Usage: python tools/sweep_mixer.py [--d-inner 2048] [--batch 128] [--L 512]
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-inner", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--d-state", type=int, default=16)
    ap.add_argument("--dt-rank", type=int, default=128)
    ap.add_argument("--bl", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--bd", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--readout", choices=["auto", "mxu", "vpu"],
                    default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import pallas_mixer

    B, L, D, N, Rk = args.batch, args.L, args.d_inner, args.d_state, args.dt_rank
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, L, D)) * 0.1, jnp.bfloat16)
    conv_w, conv_b = f(D, 4), f(D)
    w_dtlr, w_B, w_C = f(D, Rk), f(D, N), f(D, N)
    dt_proj_w, dt_bias = f(Rk, D), f(D)
    A, Dskip = -jnp.abs(f(D, N)) - 0.5, f(D)

    for bl, bd in itertools.product(args.bl, args.bd):
        if L % bl or D % bd:
            continue

        def run(x):
            return pallas_mixer.mixer_scan_fused(
                x, conv_w, conv_b, w_dtlr, w_B, w_C, dt_proj_w, dt_bias,
                A, Dskip, bl=bl, bd=bd, readout=args.readout)

        try:
            jitted = jax.jit(run)
            y = jitted(xi)
            y.block_until_ready()
            t0 = time.time()
            for _ in range(args.reps):
                y = jitted(xi)
            y.block_until_ready()
            dt = (time.time() - t0) / args.reps
            print(json.dumps({"bl": bl, "bd": bd, "readout": args.readout,
                              "ms": round(dt * 1e3, 3),
                              "gb_s": round(
                                  (2 * B * L * D * 2) / dt / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"bl": bl, "bd": bd,
                              "error": str(e).splitlines()[0][:120]}),
                  flush=True)


if __name__ == "__main__":
    main()
