"""Pallas selective-scan kernel vs JAX reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops import pallas_scan
from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential


def make_inputs(rng, G=2, B=2, L=128, D=32, N=8):
    x = rng.standard_normal((G, B, L, D)).astype(np.float32)
    dt = (rng.standard_normal((G, B, L, D)) * 0.5 - 1.0).astype(np.float32)
    A = -np.exp(rng.standard_normal((G, D, N)) * 0.5).astype(np.float32)
    Bm = rng.standard_normal((G, B, L, N)).astype(np.float32)
    Cm = rng.standard_normal((G, B, L, N)).astype(np.float32)
    Ds = rng.standard_normal((G, D)).astype(np.float32)
    dtb = (rng.standard_normal((G, D)) * 0.3).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, dt, A, Bm, Cm, Ds, dtb))


@pytest.mark.parametrize("shape", [
    dict(G=2, B=2, L=128, D=32, N=8),
    dict(G=1, B=1, L=256, D=16, N=4),   # multiple L-chunks with bl=128
])
def test_pallas_fwd_matches_reference(rng, shape):
    args = make_inputs(rng, **shape)
    want = selective_scan_sequential(*args[:6], dt_bias=args[6])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan.selective_scan_pallas(
            *args[:6], dt_bias=args[6], bl=128, bd=16, t_inner=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_reverse_and_fused_dtproj(rng):
    """directions=(False, True) + in-kernel dt projection vs the explicit
    flip + einsum formulation."""
    G, B, L, D, N, R = 2, 2, 128, 32, 8, 4
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt_lr = jnp.asarray(rng.standard_normal((G, B, L, R)) * 0.5, jnp.float32)
    wdt = jnp.asarray(rng.standard_normal((G, R, D)) * 0.3, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, D, N)) * 0.5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * 0.3, jnp.float32)

    # reference: project dt, flip group 1 around a forward scan
    dt = jnp.einsum("gblr,gri->gbli", dt_lr, wdt)
    flip1 = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))
    want = selective_scan_sequential(flip1(x), flip1(dt), A, flip1(Bm),
                                     flip1(Cm), Ds, dt_bias=dtb)
    want = flip1(want)

    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan.selective_scan_pallas(
            x, dt_lr, A, Bm, Cm, Ds, dt_bias=dtb, dt_proj_w=wdt,
            directions=(False, True), bl=64, bd=16, t_inner=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_model_path_matches_flip_path(rng):
    """mamba_mixer's flip-free pallas path == the explicit-flip JAX path."""
    import dataclasses

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    cfg = CaduceusConfig(d_model=16, n_layer=2, vocab_size=16, d_state=4)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(7, 11, size=(2, 64)), jnp.int32)
    ref = caduceus.forward(params, ids,
                           dataclasses.replace(cfg, scan_impl="associative"),
                           dtype=jnp.float32)["logits"]
    with pltpu.force_tpu_interpret_mode():
        got = caduceus.forward(params, ids,
                               dataclasses.replace(cfg, scan_impl="pallas"),
                               dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_manual_bwd_matches_autodiff(rng):
    """Hand-written chunked backward (ops.scan_bwd) vs autodiff of the
    sequential reference."""
    G, B, L, D, N = 2, 2, 64, 16, 4
    args = make_inputs(rng, G=G, B=B, L=L, D=D, N=N)

    def loss_ref(*a):
        y = selective_scan_sequential(*a[:6], dt_bias=a[6])
        return jnp.sum(jnp.sin(y))

    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)

    from plantcaduceus_tpu.ops.scan_bwd import selective_scan_grads

    y = selective_scan_sequential(*args[:6], dt_bias=args[6])
    gy = jnp.cos(y)
    got = selective_scan_grads(args[0], args[1], args[2], args[3], args[4],
                               args[5], args[6], gy, chunk=16)
    # order: dx, ddt_raw, dA, dBm, dCm, dDskip, ddt_bias
    for g, w, name in zip(got, want, ["x", "dt", "A", "B", "C", "D", "dtb"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_bimamba_gated_bwd(rng):
    """Fused bidirectional-gated op: value + grads vs reference composition."""
    G, B, L, D, N, R = 2, 2, 64, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt_lr = jnp.asarray(rng.standard_normal((G, B, L, R)) * 0.5, jnp.float32)
    wdt = jnp.asarray(rng.standard_normal((G, R, D)) * 0.3, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, D, N)) * 0.5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * 0.3, jnp.float32)
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
        y = pallas_scan.bimamba_scan_gated(*a, bl=32, bd=16, t_inner=1)
        return jnp.sum(jnp.sin(y))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ref(*a)))

    with pltpu.force_tpu_interpret_mode():
        y_fused = pallas_scan.bimamba_scan_gated(*args, bl=32, bd=16)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(ref(*args)),
                               rtol=2e-4, atol=2e-4)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["x", "dt_lr", "A", "B", "C", "D", "dtb", "wdt", "z"]
    for g, w, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-3, atol=3e-4, err_msg=name)


def test_pallas_bwd_matches_reference(rng):
    args = make_inputs(rng, G=1, B=1, L=64, D=16, N=4)

    def loss_pallas(*a):
        y = pallas_scan.selective_scan_pallas(
            *a[:6], dt_bias=a[6], bl=64, bd=16, t_inner=16)
        return jnp.sum(y * y)

    def loss_ref(*a):
        y = selective_scan_sequential(*a[:6], dt_bias=a[6])
        return jnp.sum(y * y)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for p, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=3e-3, atol=3e-3)


def test_fused_mixer_inference_path(rng):
    """The whole-mixer fused kernel (fused_inference=True) must match the
    decomposed path exactly."""
    import dataclasses

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    cfg = CaduceusConfig(d_model=16, n_layer=2, vocab_size=16, d_state=4)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(7, 11, size=(2, 64)), jnp.int32)
    ref = caduceus.forward(params, ids,
                           dataclasses.replace(cfg, scan_impl="associative"),
                           dtype=jnp.float32)["logits"]
    with pltpu.force_tpu_interpret_mode():
        got = caduceus.forward(params, ids,
                               dataclasses.replace(cfg, scan_impl="pallas"),
                               dtype=jnp.float32,
                               fused_inference=True)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_fused_mixer_training_grads(rng):
    """bimamba_mixer_fused gradients == XLA AD through the decomposed JAX
    formulation (conv + x_proj + scan + gate), every input and parameter."""
    from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
    from plantcaduceus_tpu.ops.pallas_mixer import bimamba_mixer_fused
    from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential

    B, L, D, N, Rk, K = 2, 64, 16, 4, 8, 4
    f32 = jnp.float32
    xi = jnp.asarray(rng.standard_normal((B, L, D)), f32)
    z = jnp.asarray(rng.standard_normal((B, L, D)), f32)
    conv_w = jnp.asarray(rng.standard_normal((2, D, K)) * .5, f32)
    conv_b = jnp.asarray(rng.standard_normal((2, D)) * .1, f32)
    w_dtlr = jnp.asarray(rng.standard_normal((2, D, Rk)) * .3, f32)
    w_B = jnp.asarray(rng.standard_normal((2, D, N)) * .3, f32)
    w_C = jnp.asarray(rng.standard_normal((2, D, N)) * .3, f32)
    w_dt = jnp.asarray(rng.standard_normal((2, Rk, D)) * .3, f32)
    dtb = jnp.asarray(rng.standard_normal((2, D)) * .3, f32)
    A = jnp.asarray(-np.exp(rng.standard_normal((2, D, N)) * .5), f32)
    Ds = jnp.asarray(rng.standard_normal((2, D)), f32)
    gw = jnp.asarray(rng.standard_normal((B, L, D)), f32)

    args = (xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, w_dt, dtb, A, Ds)

    def ref_loss(xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, w_dt, dtb, A, Ds):
        ys = []
        for g in range(2):
            xg = jax.nn.silu(depthwise_conv_xla(
                xi, conv_w[g], conv_b[g], activation=None,
                anticausal=(g == 1)))
            dt = jnp.einsum("bli,ir->blr", xg, w_dtlr[g]) @ w_dt[g]
            Bm = jnp.einsum("bli,in->bln", xg, w_B[g])
            Cm = jnp.einsum("bli,in->bln", xg, w_C[g])
            flip = (lambda t: jnp.flip(t, axis=2)) if g == 1 else (lambda t: t)
            y = selective_scan_sequential(
                flip(xg[None]), flip(dt[None]), A[g:g + 1], flip(Bm[None]),
                flip(Cm[None]), Ds[g:g + 1], dt_bias=dtb[g:g + 1])
            ys.append(flip(y)[0])
        return jnp.sum((ys[0] + ys[1]) * jax.nn.silu(z) * gw)

    def fused_loss(*a):
        return jnp.sum(bimamba_mixer_fused(*a).astype(f32) * gw)

    want = jax.grad(ref_loss, argnums=tuple(range(11)))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(fused_loss, argnums=tuple(range(11))))(*args)

    names = ["dxi", "dz", "dconv_w", "dconv_b", "dw_dtlr", "dw_B", "dw_C",
             "dw_dt", "ddtb", "dA", "dD"]
    for n, g, r in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=n)


def pallas_scan_module_fused_x(*a):
    from plantcaduceus_tpu.ops.pallas_mixer import bimamba_mixer_fused_x
    return bimamba_mixer_fused_x(*a)


def test_bimamba_fused_x_value_and_grads(rng):
    """bimamba_mixer_fused_x (in-kernel in_proj): value == einsum + fused
    mixer; grads (incl. dx and dw_in through the custom VJP's einsum
    chain) == autodiff of the reference composition."""
    B, L, Dm, D, N, R = 2, 64, 8, 16, 4, 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    x = f(B, L, Dm)
    z = f(B, L, D)
    w_in = f(Dm, D)
    conv_w, conv_b = f(2, D, 4), f(2, D)
    w_dtlr, w_B, w_C = f(2, D, R), f(2, D, N), f(2, D, N)
    wdt, dtb = f(2, R, D), f(2, D)
    A = -jnp.abs(f(2, D, N)) - 0.3
    Ds = f(2, D)
    args = (x, z, w_in, conv_w, conv_b, w_dtlr, w_B, w_C, wdt, dtb, A, Ds)

    def ref(x, z, w_in, conv_w, conv_b, w_dtlr, w_B, w_C, wdt, dtb, A, Ds):
        xi = jnp.einsum("bld,di->bli", x, w_in)
        ys = []
        from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
        for g in range(2):
            xg = depthwise_conv_xla(xi, conv_w[g], conv_b[g],
                                    activation="silu", anticausal=(g == 1))
            dt_lr = jnp.einsum("bli,ir->blr", xg, w_dtlr[g])
            Bm = jnp.einsum("bli,in->bln", xg, w_B[g])
            Cm = jnp.einsum("bli,in->bln", xg, w_C[g])
            dt = jnp.einsum("blr,ri->bli", dt_lr, wdt[g])
            flip = (lambda t: jnp.flip(t, 1)) if g else (lambda t: t)
            y = selective_scan_sequential(
                flip(xg)[None], flip(dt)[None], A[g][None], flip(Bm)[None],
                flip(Cm)[None], Ds[g][None], dt_bias=dtb[g][None])
            ys.append(flip(y[0]))
        return (ys[0] + ys[1]) * jax.nn.silu(z)

    want = ref(*args)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan_module_fused_x(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)

    loss_p = lambda *a: jnp.sum(jnp.sin(pallas_scan_module_fused_x(*a)))
    loss_r = lambda *a: jnp.sum(jnp.sin(ref(*a)))
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=tuple(range(12)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(12)))(*args)
    names = ["x", "z", "w_in", "conv_w", "conv_b", "w_dtlr", "w_B", "w_C",
             "wdt", "dtb", "A", "Ds"]
    for g, w, name in zip(gp, gr, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=4e-3, atol=4e-4, err_msg=name)


@pytest.mark.parametrize("reverse", [False, True])
def test_mixer_readout_vpu_matches_mxu(rng, reverse):
    """The opt-in VPU C-readout (mul + sublane-tree reduce) must produce
    the same values as the default per-step MXU dot — same math, different
    engine (ops/pallas_mixer._mixer_kernel readout_vpu branch)."""
    from plantcaduceus_tpu.ops.pallas_mixer import mixer_scan_fused

    B, L, D, N, R = 2, 128, 32, 8, 8
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    args = (f(B, L, D), f(D, 4), f(D), f(D, R), f(D, N), f(D, N),
            f(R, D), f(D), -jnp.abs(f(D, N)) - 0.3, f(D))
    with pltpu.force_tpu_interpret_mode():
        want = mixer_scan_fused(*args, reverse=reverse, bl=64, bd=32,
                                readout="mxu")
        got = mixer_scan_fused(*args, reverse=reverse, bl=64, bd=32,
                               readout="vpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pick_bl_divisor_policy():
    """pick_bl: largest multiple-of-8 divisor <= cap; rejects L % 8 != 0
    (the PlantCAD2 LoRA recipe's 600-bp windows are the motivating case:
    docs/PlantCAD2-overview.md tokenizes at sequence_length 600)."""
    assert pallas_scan.pick_bl(512, 512) == 512
    assert pallas_scan.pick_bl(600, 512) == 200
    assert pallas_scan.pick_bl(600, 256) == 200
    assert pallas_scan.pick_bl(264, 256) == 88
    assert pallas_scan.pick_bl(64, 512) == 64
    assert pallas_scan.pick_bl(24, 16) == 8
    with pytest.raises(ValueError, match="multiple of 8"):
        pallas_scan.pick_bl(601, 512)


def test_scan_non_power_of_two_length(rng):
    """L=264 with an explicit bl that doesn't divide it: the group resolves
    a divisor chunk (88) and still matches the sequential reference."""
    args = make_inputs(rng, G=2, B=1, L=264, D=16, N=4)
    want = selective_scan_sequential(*args[:6], dt_bias=args[6])
    with pltpu.force_tpu_interpret_mode():
        got = pallas_scan.selective_scan_pallas(*args[:6], dt_bias=args[6],
                                                bl=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fused_mixer_grads_non_power_of_two_length(rng):
    """Training fwd+bwd at L=264 (> TRAIN_BL, not a multiple of it): the
    residual-emitting forward and the Pallas backward must resolve the
    same divisor chunking (88) and match XLA autodiff of the decomposed
    formulation."""
    from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
    from plantcaduceus_tpu.ops.pallas_mixer import bimamba_mixer_fused

    B, L, D, N, Rk, K = 1, 264, 16, 4, 8, 4
    f32 = jnp.float32
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, f32)
    xi, z = f(B, L, D), f(B, L, D)
    conv_w, conv_b = f(2, D, K), f(2, D)
    w_dtlr, w_B, w_C = f(2, D, Rk), f(2, D, N), f(2, D, N)
    w_dt, dtb = f(2, Rk, D), f(2, D)
    A = -jnp.abs(f(2, D, N)) - 0.3
    Ds = f(2, D)
    gw = f(B, L, D)
    args = (xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, w_dt, dtb, A, Ds)

    def ref_loss(xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, w_dt, dtb, A, Ds):
        ys = []
        for g in range(2):
            xg = jax.nn.silu(depthwise_conv_xla(
                xi, conv_w[g], conv_b[g], activation=None,
                anticausal=(g == 1)))
            dt = jnp.einsum("bli,ir->blr", xg, w_dtlr[g]) @ w_dt[g]
            Bm = jnp.einsum("bli,in->bln", xg, w_B[g])
            Cm = jnp.einsum("bli,in->bln", xg, w_C[g])
            flip = (lambda t: jnp.flip(t, axis=2)) if g == 1 else (lambda t: t)
            y = selective_scan_sequential(
                flip(xg[None]), flip(dt[None]), A[g:g + 1], flip(Bm[None]),
                flip(Cm[None]), Ds[g:g + 1], dt_bias=dtb[g:g + 1])
            ys.append(flip(y)[0])
        return jnp.sum((ys[0] + ys[1]) * jax.nn.silu(z) * gw)

    def fused_loss(*a):
        return jnp.sum(bimamba_mixer_fused(*a).astype(f32) * gw)

    want_v = ref_loss(*args)
    want = jax.grad(ref_loss, argnums=(0, 1, 4, 9))(*args)
    with pltpu.force_tpu_interpret_mode():
        got_v = fused_loss(*args)
        got = jax.jit(jax.grad(fused_loss, argnums=(0, 1, 4, 9)))(*args)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=2e-4)
    for n, g, r in zip(["dxi", "dz", "dw_dtlr", "dA"], got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=n)
