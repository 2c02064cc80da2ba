"""Experiment: form the scan's decay/input terms per-step instead of upfront.

The production forward kernel (ops/pallas_scan.py) materialises
``a = exp2(dtp*A')`` and ``b = (dtp*x)*B`` as whole-chunk [bl, N, bd] VMEM
tensors before the recurrence loop, then re-reads one [N, bd] slice per step.
That is 4 VMEM touches per state (write+read x2) on top of the arithmetic.
This sweep times three variants of a minimal single-direction kernel at the
flagship per-layer shape to see whether folding the formation into the loop
(trading VMEM round-trips for per-step broadcasts) wins on v5e:

  upfront  — production scheme (a, b whole-chunk)
  a_loop   — exp2 decay formed per step; b still whole-chunk
  ab_loop  — both formed per step (B broadcast [N,1]x[1,bd] per step)

Usage: python tools/exp_inloop.py [--bl 512] [--bd 256] [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG2E = 1.4426950408889634


def make_kernel(variant: str):
    def kernel(A_ref, x_ref, dt_ref, B_ref, C_ref, y_ref, h_scr):
        li = pl.program_id(2)

        @pl.when(li == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)

        x = x_ref[...].astype(jnp.float32)      # [1, bl, bd]
        Bm = B_ref[...].astype(jnp.float32)     # [1, bl, N]
        Cm = C_ref[...].astype(jnp.float32)     # [1, bl, N]
        At = A_ref[0].astype(jnp.float32).T     # [N, bd]
        _, bl, bd = x.shape
        N = Bm.shape[-1]

        dtp = jax.nn.softplus(dt_ref[...].astype(jnp.float32))  # [1, bl, bd]
        At2 = At * LOG2E
        dtx = dtp * x                                           # [1, bl, bd]
        if variant in ("upfront",):
            a = jnp.exp2(dtp[:, :, None, :] * At2[None, None])  # [1,bl,N,bd]
        if variant in ("upfront", "a_loop"):
            b = dtx[:, :, None, :] * Bm[..., None]              # [1,bl,N,bd]

        h0 = h_scr[...]                                         # [1, N, bd]
        outs = []
        for t in range(bl):
            if variant == "upfront":
                hc = b[:, t] + a[:, t] * h0
            elif variant == "a_loop":
                at = jnp.exp2(dtp[:, t][:, None, :] * At2[None])
                hc = b[:, t] + at * h0
            else:  # ab_loop
                at = jnp.exp2(dtp[:, t][:, None, :] * At2[None])
                bt = Bm[:, t][:, :, None] * dtx[:, t][:, None, :]
                hc = bt + at * h0
            h0 = hc
            outs.append(jax.lax.dot_general(
                Cm[:, t], hc[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))            # [1, bd]
        h_scr[...] = h0
        y_ref[...] = jnp.stack(outs, axis=1).astype(y_ref.dtype)

    return kernel


def build(variant, R, L, D, N, bl, bd):
    grid = (R, D // bd, L // bl)
    xmap = lambda r, d, l: (r, l, d)
    f = pl.pallas_call(
        make_kernel(variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bd, N), lambda r, d, l: (0, d, 0)),   # A
            pl.BlockSpec((1, bl, bd), xmap),                       # x
            pl.BlockSpec((1, bl, bd), xmap),                       # dt
            pl.BlockSpec((1, bl, N), lambda r, d, l: (r, l, 0)),   # B
            pl.BlockSpec((1, bl, N), lambda r, d, l: (r, l, 0)),   # C
        ],
        out_specs=pl.BlockSpec((1, bl, bd), xmap),
        out_shape=jax.ShapeDtypeStruct((R, L, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, N, bd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--R", type=int, default=256)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--D", type=int, default=768)
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--bl", type=int, default=512)
    ap.add_argument("--bd", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    global jax, jnp, pl, pltpu
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L, D, N = args.R, args.L, args.D, args.N
    rng = np.random.default_rng(0)
    A = -np.exp(rng.standard_normal((1, D, N)) * .5).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((R, L, D)), jnp.bfloat16)
    dt = jnp.asarray(rng.standard_normal((R, L, D)) - 1.5, jnp.bfloat16)
    Bm = jnp.asarray(rng.standard_normal((R, L, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((R, L, N)), jnp.bfloat16)
    A = jnp.asarray(A)
    states = R * L * D * N

    ref = None
    for variant in ("upfront", "a_loop", "ab_loop"):
        try:
            f = build(variant, R, L, D, N, args.bl, args.bd)
            g = jax.jit(lambda A, x, dt, Bm, Cm, f=f:
                        (f(A, x, dt, Bm, Cm), jnp.sum(f(A, x, dt, Bm, Cm))))
            y, s = g(A, x, dt, Bm, Cm)
            float(s)  # compile+fence
            if ref is None:
                ref = np.asarray(y[:2, -4:, :8], np.float32)
            else:
                got = np.asarray(y[:2, -4:, :8], np.float32)
                assert np.allclose(ref, got, atol=2e-2), "variant mismatch"
            t0 = time.time()
            for _ in range(args.iters):
                _, s = g(A, x, dt, Bm, Cm)
            float(s)
            dt_s = (time.time() - t0) / args.iters / 2  # g runs f twice
            print(f"{variant:8s}: {dt_s*1e3:7.2f} ms  "
                  f"{states/dt_s/1e9:7.1f} Gstates/s", flush=True)
        except Exception as e:
            print(f"{variant}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
