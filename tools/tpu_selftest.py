"""On-chip Pallas kernel self-test: compiled-on-TPU numerics vs JAX references.

The pytest suite asserts kernel-vs-reference equality in interpret mode on
CPU (tests/test_pallas_*.py); this tool runs the same families — selective
scan (fwd, native-reverse + fused dt-proj, grads), the fused bidirectional
gated mixer op, the SSD (Mamba-2) kernel, and flash attention — *compiled on
the real device* at production tile sizes, with bf16 activation checks at
bf16 tolerances. bench.py invokes it before timing so every recorded BENCH
run also certifies on-chip numerics.

Prints one JSON line per check and a final summary line; exit code 1 if any
check fails. Off-TPU it falls back to interpret mode so the tool itself is
exercisable in CI.

Usage: python tools/tpu_selftest.py [--fast]
"""

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FP32 = dict(rtol=5e-3, atol=5e-4)
BF16 = dict(rtol=4e-2, atol=4e-2)


def _ctx():
    import jax
    from jax.experimental.pallas import tpu as pltpu

    if jax.devices()[0].platform == "cpu":
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


def _scan_inputs(rng, G, B, L, D, N):
    import jax.numpy as jnp

    x = rng.standard_normal((G, B, L, D)).astype(np.float32)
    dt = (rng.standard_normal((G, B, L, D)) * 0.5 - 1.0).astype(np.float32)
    A = -np.exp(rng.standard_normal((G, D, N)) * 0.5).astype(np.float32)
    Bm = rng.standard_normal((G, B, L, N)).astype(np.float32)
    Cm = rng.standard_normal((G, B, L, N)).astype(np.float32)
    Ds = rng.standard_normal((G, D)).astype(np.float32)
    dtb = (rng.standard_normal((G, D)) * 0.3).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, dt, A, Bm, Cm, Ds, dtb))


def check_scan_fwd(rng, fast):
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import pallas_scan
    from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential

    # Production l20-like tile shapes: bl=512 (whole window), bd=256.
    args = _scan_inputs(rng, G=2, B=2, L=512, D=256, N=16)
    want = selective_scan_sequential(*args[:6], dt_bias=args[6])
    with _ctx():
        got = pallas_scan.selective_scan_pallas(*args[:6], dt_bias=args[6])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **FP32)

    # bf16 activations (the inference/serving dtype): reference gets the
    # SAME bf16 inputs (it upcasts internally), so any disagreement is the
    # kernel's, not the input rounding's.
    bf = [a.astype(jnp.bfloat16) for a in (args[0], args[1], args[3], args[4])]
    want16 = selective_scan_sequential(
        bf[0], bf[1], args[2], bf[2], bf[3], args[5], dt_bias=args[6])
    with _ctx():
        got16 = pallas_scan.selective_scan_pallas(
            bf[0], bf[1], args[2], bf[2], bf[3], args[5], dt_bias=args[6])
    np.testing.assert_allclose(np.asarray(got16, dtype=np.float32),
                               np.asarray(want16, dtype=np.float32), **BF16)


def check_scan_reverse_dtproj(rng, fast):
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import pallas_scan
    from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential

    G, B, L, D, N, R = 2, 2, 512, 256, 16, 16
    x, _, A, Bm, Cm, Ds, dtb = _scan_inputs(rng, G, B, L, D, N)
    dt_lr = jnp.asarray(rng.standard_normal((G, B, L, R)) * 0.5, jnp.float32)
    wdt = jnp.asarray(rng.standard_normal((G, R, D)) * 0.3, jnp.float32)

    dt = jnp.einsum("gblr,gri->gbli", dt_lr, wdt)
    flip1 = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))
    want = selective_scan_sequential(flip1(x), flip1(dt), A, flip1(Bm),
                                     flip1(Cm), Ds, dt_bias=dtb)
    want = flip1(want)
    with _ctx():
        got = pallas_scan.selective_scan_pallas(
            x, dt_lr, A, Bm, Cm, Ds, dt_bias=dtb, dt_proj_w=wdt,
            directions=(False, True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **FP32)


def check_gated_mixer_grads(rng, fast):
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import pallas_scan
    from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential

    G, B, L, D, N, R = 2, 1, 512, 128, 16, 16
    x, _, A, Bm, Cm, Ds, dtb = _scan_inputs(rng, G, B, L, D, N)
    dt_lr = jnp.asarray(rng.standard_normal((G, B, L, R)) * 0.5, jnp.float32)
    wdt = jnp.asarray(rng.standard_normal((G, R, D)) * 0.3, jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    args = (x, dt_lr, A, Bm, Cm, Ds, dtb, wdt, z)

    def ref(*a):
        x, dt_lr, A, Bm, Cm, Ds, dtb, wdt, z = a
        dt = jnp.einsum("gblr,gri->gbli", dt_lr, wdt)
        flip1 = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))
        y = selective_scan_sequential(flip1(x), flip1(dt), A, flip1(Bm),
                                      flip1(Cm), Ds, dt_bias=dtb)
        y = flip1(y)
        return (y[0] + y[1]) * jax.nn.silu(z)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(pallas_scan.bimamba_scan_gated(*a, bd=128)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ref(*a)))

    with _ctx():
        y = pallas_scan.bimamba_scan_gated(*args, bd=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(*args)), **FP32)

    with _ctx():
        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["x", "dt_lr", "A", "B", "C", "D", "dtb", "wdt", "z"]
    for g, w, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=8e-3, atol=2e-3, err_msg=name)


def check_ssd(rng, fast):
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import pallas_ssd
    from plantcaduceus_tpu.ops.ssd import ssd_sequential

    G, B, L, H, P, NG, N = 2, 1, 512, 2, 128, 1, 128
    x = jnp.asarray(rng.standard_normal((G, B, L, H, P)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((G, B, L, H)) * 0.5 - 1.0, jnp.float32)
    A = -jnp.asarray(np.exp(rng.standard_normal((G, H)) * 0.5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, NG, N)) * 0.3, jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, NG, N)) * 0.3, jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, H)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, H)) * 0.3, jnp.float32)
    dirs = (False, True)

    want = ssd_sequential(x, dt, A, Bm, Cm, Ds, dt_bias=dtb, directions=dirs)
    with _ctx():
        got = pallas_ssd.ssd_pallas(x, dt, A, Bm, Cm, Ds, dt_bias=dtb,
                                    chunk=128, directions=dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **FP32)

    if fast:  # --fast certifies forwards only; grads are the slow compiles
        return

    def loss_pl(*a):
        with _ctx():
            y = pallas_ssd.ssd_pallas(*a, chunk=128, directions=dirs)
        return jnp.sum(jnp.sin(y))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ssd_sequential(*a, directions=dirs)))

    argnums = tuple(range(7))
    gf = jax.grad(loss_pl, argnums=argnums)(x, dt, A, Bm, Cm, Ds, dtb)
    gr = jax.grad(loss_ref, argnums=argnums)(x, dt, A, Bm, Cm, Ds, dtb)
    names = ["x", "dt", "A", "B", "C", "D", "dtb"]
    for g, w, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=8e-3, atol=2e-3, err_msg=name)


def check_mixer2_interior_grads(rng, fast):
    """Fused mamba2 mixer interior (conv + SSD + gated norm,
    ops/pallas_mixer2.py): value AND grads vs the decomposed XLA path,
    compiled on-chip — certifies the residual-emitting training forward and
    the hand-written adjoint chain, not just the kernel in interpret mode."""
    import functools

    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops.pallas_mixer2 import (_interior_xla,
                                                     mamba2_mixer_interior)

    R, L, H, P, NG, N, K = 2, 256, 2, 128, 1, 128, 4
    DI, NGN = H * P, NG * N
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    kw = dict(
        xi=f(R, L, DI), z=f(R, L, DI), Braw=f(R, L, NGN), Craw=f(R, L, NGN),
        dt=f(R, L, H) * 0.5 - 1.0,
        cxw=f(DI, K) * 0.3, cxb=f(DI) * 0.1,
        cbw=f(NGN, K) * 0.3, cbb=f(NGN) * 0.1,
        ccw=f(NGN, K) * 0.3, ccb=f(NGN) * 0.1,
        nw=1.0 + 0.1 * f(DI),
        A=-jnp.exp(f(H) * 0.5), Dsk=f(H), dtb=f(H) * 0.3,
    )
    args = tuple(kw.values())
    fused = functools.partial(mamba2_mixer_interior, d_state=N, eps=1e-5,
                              chunk=128, reverse=True)
    ref = functools.partial(_interior_xla, N=N, eps=1e-5, chunk=128,
                            reverse=True)

    with _ctx():
        got = fused(*args)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref(*kw.values())), **FP32)

    def loss_pl(*a):
        with _ctx():
            return jnp.sum(jnp.sin(fused(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ref(*a)))

    argnums = tuple(range(len(args)))
    gf = jax.grad(loss_pl, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    for g, w, name in zip(gf, gr, kw):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=8e-3, atol=2e-3, err_msg=name)


def check_flash_attention(rng, fast):
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.ops import attention as ATT
    from plantcaduceus_tpu.ops import pallas_attention as FA

    B, L, H, hd = 2, 512, 4, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    slopes = ATT.alibi_slopes(H)

    pos = jnp.arange(L)
    dist = jnp.abs(pos[None, :] - pos[:, None]).astype(jnp.float32)
    bias = -slopes[:, None, None] * dist[None]
    want = ATT.multi_head_attention(q, k, v, bias=bias)
    with _ctx():
        got = FA.flash_attention(q, k, v, alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **FP32)

    def loss_fa(q, k, v):
        with _ctx():
            return jnp.sum(jnp.sin(
                FA.flash_attention(q, k, v, alibi_slopes=slopes)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(
            ATT.multi_head_attention(q, k, v, bias=bias)))

    gf = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(gf, gr, ["q", "k", "v"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=8e-3, atol=2e-3, err_msg=name)


CHECKS = [
    ("scan_fwd_fp32_bf16", check_scan_fwd),
    ("scan_reverse_fused_dtproj", check_scan_reverse_dtproj),
    ("gated_mixer_value_grads", check_gated_mixer_grads),
    ("ssd_value_grads", check_ssd),
    ("mixer2_interior_value_grads", check_mixer2_interior_grads),
    ("flash_attention_value_grads", check_flash_attention),
]

# --fast: one check per SSM family, forward-only — certifies the scoring
# path's kernels in a fraction of the cold-compile cost (the grad checks
# are the ≥1400s-cold compiles). bench.py runs this subset before timing
# and the full set only if wall-clock budget remains.
CHECKS_FAST = [
    ("scan_fwd_fp32_bf16", check_scan_fwd),
    ("ssd_value_grads", check_ssd),  # fwd-only under fast
]


def run(fast: bool = False) -> bool:
    """Run all checks (or the --fast forward-only subset); returns True iff
    every check passed."""
    import jax

    # References must be exact: force full-precision matmuls so any
    # disagreement is the kernel's, not the reference einsum's. MUST be
    # restored afterwards — the setting is process-global, and leaving
    # "highest" set changes how callers' kernels lower (bigger multi-pass
    # MXU dots → more scoped VMEM; measured: it pushed the l32 fused mixer
    # over the 16MB limit inside bench.py) and skews timings.
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        platform = jax.devices()[0].platform
        rng = np.random.default_rng(1234)
        ok = True
        checks = CHECKS_FAST if fast else CHECKS
        for name, fn in checks:
            t0 = time.time()
            try:
                fn(rng, fast)
                print(json.dumps({"check": name, "ok": True,
                                  "platform": platform,
                                  "secs": round(time.time() - t0, 1)}),
                      flush=True)
            except AssertionError as e:
                ok = False
                msg = str(e).splitlines()
                print(json.dumps({"check": name, "ok": False,
                                  "platform": platform,
                                  "error": " / ".join(msg[:4])}), flush=True)
        print(json.dumps({"selftest": "pass" if ok else "FAIL",
                          "fast": fast,
                          "platform": platform, "checks": len(checks)}),
              flush=True)
        return ok
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()
    sys.exit(0 if run(args.fast) else 1)


if __name__ == "__main__":
    main()
