"""Sweep Pallas scan tile parameters on the real TPU.

Usage: python tools/sweep_scan.py [--model l20] [--batch 128]
Times the scan at the exact shape the model uses per layer, for a grid of
(bl, bd, t_inner), plus the XLA associative fallback for reference.
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="l20")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.ops import pallas_scan

    cfg = CaduceusConfig.preset(args.model)
    G, B, L, D, N = 2, 2 * args.batch, args.seqlen, cfg.d_inner, cfg.d_state
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.bfloat16)
    dt = jnp.asarray(rng.standard_normal((G, B, L, D)) - 1.5, jnp.bfloat16)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((G, D, N)) * .5, jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.bfloat16)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * .3, jnp.float32)
    states = G * B * L * D * N

    def bench(f):
        # block_until_ready does not reliably block through the remote-TPU
        # relay; force a scalar host readback to fence the timing.
        g = jax.jit(lambda *a: jnp.sum(f(*a)[:, :, -1, :]))
        float(g(x, dt, A, Bm, Cm, Ds, dtb))  # compile
        t = time.time()
        for _ in range(args.iters):
            s = g(x, dt, A, Bm, Cm, Ds, dtb)
        float(s)
        return (time.time() - t) / args.iters

    results = []
    for bb, bl, bd, t in itertools.product([1, 2, 4, 8, 16],
                                           [64, 128, 256, 512],
                                           [128, 256],
                                           [1, 8]):
        if bl < t or bd > D or bl > L or D % bd:
            continue
        if bb * bl * bd * 16 * 4 * 2 > 12 * 2**20:  # a+b VMEM cap
            continue
        try:
            f = (lambda *a, bb=bb, bl=bl, bd=bd, t=t:
                 pallas_scan.selective_scan_pallas(
                     *a[:6], dt_bias=a[6], bl=bl, bd=bd, t_inner=t, bb=bb))
            dt_s = bench(f)
            results.append((dt_s, bb, bl, bd, t))
            print(f"bb={bb:3d} bl={bl:4d} bd={bd:4d} t={t:3d}: {dt_s*1e3:7.2f} ms  "
                  f"{states/dt_s/1e9:7.1f} Gstates/s", flush=True)
        except Exception as e:
            print(f"bb={bb} bl={bl} bd={bd} t={t}: FAIL {type(e).__name__}: "
                  f"{str(e)[:80]}", flush=True)

    results.sort()
    print("\nbest:", results[0] if results else None)


if __name__ == "__main__":
    main()
