"""Fused Mamba-2 mixer-interior kernel: conv prologue + SSD + gated norm.

Same rationale as the Mamba-1 fused mixer (ops/pallas_mixer.py): with the
SSD recurrence itself fast (ops/pallas_ssd.py, ~9 ms/layer at l32 shapes),
the mamba2 block became bound by its XLA glue — the depthwise convs over
x/B/C, the silu gate, and the RMS norm each cost a full [rows, L, d_inner]
HBM round-trip. This kernel runs the whole mixer interior per direction in
one pallas_call:

    conv(x|B|C) -> silu -> SSD chunk core -> u = rmsnorm(y * silu(z))

so HBM traffic is exactly: read xi, z, Braw, Craw, dt; write u.

The causal conv needs K-1 rows of the neighbouring chunk: a [K-1, *] VMEM
scratch carries the tail across the (sequential) chunk grid — zero at the
sequence edge, which reproduces causal_conv1d's zero padding. In reverse
(anticausal) mode the grid runs right-to-left and the tail holds the first
rows of the *later* chunk, so the conv is flip∘causal∘flip without flips.

Backward (training): the same fused forward re-runs with ``emit_residuals``
— one extra kernel output per saved tensor (pre-SiLU conv accumulators for
x/B/C, the SSD chunk-entry states, and the pre-gate SSD output y) — and the
hand-written backward chains the Pallas SSD adjoint
(ops/pallas_ssd._bwd_kernel) with the conv transposes and the gated-norm
adjoint. Neither the forward nor a remat recompute ever rebuilds the
decomposed conv/projection intermediates through XLA — the mamba2 analogue
of ops/pallas_mixer.bimamba_mixer_fused's training path (r3's mamba1 fix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops.pallas_ssd import ssd_chunk_core


def _conv_acc(xin, tail, w, b, K: int, T: int, reverse: bool):
    """Depthwise conv of one chunk, PRE-activation. xin [T, C], tail
    [K-1, C] from the previously processed chunk, w [K, C] (tap K-1 = the
    current step), b [1, C]. The caller applies SiLU — the training variant
    emits this pre-SiLU accumulator as a residual."""
    f32 = jnp.float32
    if not reverse:
        xcat = jnp.concatenate([tail, xin], axis=0)        # [T+K-1, C]
        acc = None
        for k in range(K):
            term = jax.lax.slice(
                xcat, (k, 0), (k + T, xcat.shape[1])).astype(f32) * \
                jax.lax.slice(w, (k, 0), (k + 1, w.shape[1])).astype(f32)
            acc = term if acc is None else acc + term
    else:
        xcat = jnp.concatenate([xin, tail], axis=0)
        acc = None
        for k in range(K):
            o = K - 1 - k
            term = jax.lax.slice(
                xcat, (o, 0), (o + T, xcat.shape[1])).astype(f32) * \
                jax.lax.slice(w, (k, 0), (k + 1, w.shape[1])).astype(f32)
            acc = term if acc is None else acc + term
    return acc + b.astype(f32)


def _silu(a):
    return a * jax.nn.sigmoid(a)


def _fused_kernel(dtb_ref, A_ref, D_ref, cxw_ref, cxb_ref, cbw_ref, cbb_ref,
                  ccw_ref, ccb_ref, nw_ref, xi_ref, z_ref, B_ref, C_ref,
                  dt_ref, *refs,
                  T: int, H: int, P: int, NG: int, N: int, K: int,
                  reverse: bool, eps: float, out_dtype, emit_res: bool):
    rest = list(refs)
    u_ref = rest.pop(0)
    if emit_res:
        # residual outputs for the hand-written training backward: pre-SiLU
        # conv accumulators, SSD chunk-entry states, pre-gate SSD output.
        ax_ref, ab_ref, ac_ref, fe_ref, y_ref = rest[:5]
        rest = rest[5:]
    S_scr, xt_scr, bt_scr, ct_scr = rest
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        S_scr[:] = jnp.zeros_like(S_scr)
        xt_scr[:] = jnp.zeros_like(xt_scr)
        bt_scr[:] = jnp.zeros_like(bt_scr)
        ct_scr[:] = jnp.zeros_like(ct_scr)

    xi = xi_ref[0]                                  # [T, di]
    Br = B_ref[0]                                   # [T, NG*N]
    Cr = C_ref[0]

    xt, bt, ct = xt_scr[...], bt_scr[...], ct_scr[...]
    # Save the next chunk's halo BEFORE overwriting (values, not refs).
    if not reverse:
        xt_scr[...] = jax.lax.slice(xi, (T - (K - 1), 0), (T, xi.shape[1]))
        bt_scr[...] = jax.lax.slice(Br, (T - (K - 1), 0), (T, Br.shape[1]))
        ct_scr[...] = jax.lax.slice(Cr, (T - (K - 1), 0), (T, Cr.shape[1]))
    else:
        xt_scr[...] = jax.lax.slice(xi, (0, 0), (K - 1, xi.shape[1]))
        bt_scr[...] = jax.lax.slice(Br, (0, 0), (K - 1, Br.shape[1]))
        ct_scr[...] = jax.lax.slice(Cr, (0, 0), (K - 1, Cr.shape[1]))

    mm = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    accx = _conv_acc(xi, xt, cxw_ref[...], cxb_ref[...], K, T, reverse)
    accB = _conv_acc(Br, bt, cbw_ref[...], cbb_ref[...], K, T, reverse)
    accC = _conv_acc(Cr, ct, ccw_ref[...], ccb_ref[...], K, T, reverse)
    if emit_res:
        ax_ref[0] = accx.astype(ax_ref.dtype)
        ab_ref[0] = accB.astype(ab_ref.dtype)
        ac_ref[0] = accC.astype(ac_ref.dtype)
        # chunk-ENTRY state: written before ssd_chunk_core advances S_scr.
        fe_ref[0, 0] = S_scr[...]
    xc = _silu(accx)
    Bc = _silu(accB)
    Cc = _silu(accC)

    y = ssd_chunk_core(
        xc, dt_ref[0], Bc.reshape(T, NG, N), Cc.reshape(T, NG, N),
        dtb_ref[...], A_ref[...], D_ref[...], S_scr,
        T=T, H=H, P=P, NG=NG, N=N, reverse=reverse,
        out_dtype=jnp.float32, mm=mm)              # [T, di] fp32

    if emit_res:
        y_ref[0] = y.astype(y_ref.dtype)

    z = z_ref[0].astype(jnp.float32)
    u = y * (z * jax.nn.sigmoid(z))
    ms = jnp.mean(u * u, axis=1, keepdims=True)    # [T, 1]
    u = u * jax.lax.rsqrt(ms + eps) * nw_ref[...].astype(jnp.float32)
    u_ref[0] = u.astype(out_dtype)


def _interior_pallas_call(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw,
                          ccb, nw, A, Dsk, dtb, *, N: int, eps: float,
                          chunk: int, reverse: bool,
                          emit_residuals: bool = False):
    R, L, di = xi.shape
    H = dt.shape[-1]
    P = di // H
    NGN = Braw.shape[-1]
    NG = NGN // N
    K = cxw.shape[-1]
    T = min(chunk, L)
    nc = L // T

    cidx = (lambda r, c: (r, nc - 1 - c)) if reverse else (lambda r, c: (r, c))
    kern = functools.partial(
        _fused_kernel, T=T, H=H, P=P, NG=NG, N=N, K=K, reverse=reverse,
        eps=eps, out_dtype=xi.dtype, emit_res=emit_residuals)
    f32 = jnp.float32
    const = lambda shape: pl.BlockSpec(shape, lambda r, c: (0,) * len(shape))
    out_specs = [pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0))]
    out_shape = [jax.ShapeDtypeStruct((R, L, di), xi.dtype)]
    if emit_residuals:
        # Pre-SiLU conv accumulators in the activation dtype (same choice as
        # ops/pallas_mixer's acc residual), chunk-entry states fp32 (the SSD
        # backward's exact-carry contract), pre-gate y in activation dtype
        # (the decomposed path's ssd_dir also returns x.dtype).
        out_specs += [
            pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0)),    # accx
            pl.BlockSpec((1, T, NGN), lambda r, c: (*cidx(r, c), 0)),   # accB
            pl.BlockSpec((1, T, NGN), lambda r, c: (*cidx(r, c), 0)),   # accC
            pl.BlockSpec((1, 1, N, di), lambda r, c: (*cidx(r, c), 0, 0)),
            pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0)),    # y
        ]
        out_shape += [
            jax.ShapeDtypeStruct((R, L, di), xi.dtype),
            jax.ShapeDtypeStruct((R, L, NGN), xi.dtype),
            jax.ShapeDtypeStruct((R, L, NGN), xi.dtype),
            jax.ShapeDtypeStruct((R, nc, N, di), jnp.float32),
            jax.ShapeDtypeStruct((R, L, di), xi.dtype),
        ]
    res = pl.pallas_call(
        kern,
        grid=(R, nc),
        in_specs=[
            const((1, H)), const((1, H)), const((1, H)),       # dtb, A, D
            const((K, di)), const((1, di)),                    # conv x w/b
            const((K, NGN)), const((1, NGN)),                  # conv B w/b
            const((K, NGN)), const((1, NGN)),                  # conv C w/b
            const((1, di)),                                    # norm weight
            pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0)),   # xi
            pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0)),   # z
            pl.BlockSpec((1, T, NGN), lambda r, c: (*cidx(r, c), 0)),  # B
            pl.BlockSpec((1, T, NGN), lambda r, c: (*cidx(r, c), 0)),  # C
            pl.BlockSpec((1, T, H), lambda r, c: (*cidx(r, c), 0)),    # dt
        ],
        out_specs=out_specs if emit_residuals else out_specs[0],
        out_shape=out_shape if emit_residuals else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((N, di), f32),           # SSD state
            pltpu.VMEM((K - 1, di), xi.dtype),  # conv tails
            pltpu.VMEM((K - 1, NGN), xi.dtype),
            pltpu.VMEM((K - 1, NGN), xi.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(dtb.reshape(1, H).astype(f32), A.reshape(1, H).astype(f32),
      Dsk.reshape(1, H).astype(f32),
      jnp.transpose(cxw).astype(xi.dtype), cxb.reshape(1, di).astype(xi.dtype),
      jnp.transpose(cbw).astype(xi.dtype), cbb.reshape(1, NGN).astype(xi.dtype),
      jnp.transpose(ccw).astype(xi.dtype), ccb.reshape(1, NGN).astype(xi.dtype),
      nw.reshape(1, di), xi, z, Braw, Craw, dt)
    return res


def _interior_xla(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
                  A, Dsk, dtb, *, N: int, eps: float, chunk: int,
                  reverse: bool):
    """Decomposed reference (and the VJP backward path)."""
    from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
    from plantcaduceus_tpu.ops.norms import rms_norm
    from plantcaduceus_tpu.ops.ssd import ssd_chunked

    R, L, di = xi.shape
    H = dt.shape[-1]
    NGN = Braw.shape[-1]
    NG = NGN // N
    xc = depthwise_conv_xla(xi, cxw, cxb, activation="silu",
                            anticausal=reverse)
    Bc = depthwise_conv_xla(Braw, cbw, cbb, activation="silu",
                            anticausal=reverse)
    Cc = depthwise_conv_xla(Craw, ccw, ccb, activation="silu",
                            anticausal=reverse)
    y = ssd_chunked(
        xc.reshape(1, R, L, H, di // H), dt[None], A[None],
        Bc.reshape(1, R, L, NG, N), Cc.reshape(1, R, L, NG, N),
        Dsk[None], dt_bias=dtb[None], chunk=chunk, directions=(reverse,),
    )[0].reshape(R, L, di)
    u = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    return rms_norm(u, nw, eps).astype(xi.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
              A, Dsk, dtb, N, eps, chunk, reverse):
    return _interior_pallas_call(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb,
                                 ccw, ccb, nw, A, Dsk, dtb, N=N, eps=eps,
                                 chunk=chunk, reverse=reverse)


def _interior_fwd(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
                  A, Dsk, dtb, N, eps, chunk, reverse):
    out, accx, accB, accC, fentry, y = _interior_pallas_call(
        xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw, A, Dsk,
        dtb, N=N, eps=eps, chunk=chunk, reverse=reverse, emit_residuals=True)
    return out, (xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
                 A, Dsk, dtb, accx, accB, accC, fentry, y)


def _interior_bwd(N, eps, chunk, reverse, res, g):
    """Hand-written adjoint chain: gated-RMS-norm backward (elementwise XLA)
    -> Pallas SSD adjoint (ops/pallas_ssd._bwd_kernel, chunk-local recompute
    from the forward's emitted entry states) -> SiLU + depthwise-conv
    transposes. The decomposed [R, L, di] conv/projection intermediates are
    never rebuilt: SiLU outputs reform from the emitted pre-SiLU
    accumulators as single fused elementwise passes."""
    from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
    from plantcaduceus_tpu.ops.pallas_ssd import _ssd_dir_bwd_kernel_call

    (xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
     A, Dsk, dtb, accx, accB, accC, fentry, y) = res
    f32 = jnp.float32
    R, L, di = xi.shape
    H = dt.shape[-1]
    NGN = Braw.shape[-1]
    NG = NGN // N

    g = g.astype(f32)
    # --- gated RMS norm: u = rmsnorm(y * silu(z)) * nw ---------------------
    zf = z.astype(f32)
    sig = jax.lax.logistic(zf)
    silu_z = zf * sig
    yf = y.astype(f32)
    v = yf * silu_z
    ms = jnp.mean(v * v, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    gnw = g * nw.astype(f32)[None, None, :]
    dnw = jnp.sum(g * v * r, axis=(0, 1))
    dv = r * gnw - v * (r * r * r) * jnp.mean(gnw * v, axis=-1,
                                              keepdims=True)
    dy = dv * silu_z
    dz = (dv * yf * (sig + silu_z * (1.0 - sig))).astype(z.dtype)

    # --- SSD adjoint (Pallas, pre-SiLU mode) -------------------------------
    # The kernel re-applies SiLU to the emitted accumulators in VMEM and
    # chains SiLU' onto the outgoing cotangents, so no [R, L, *] silu /
    # dacc tensors are rebuilt in XLA; gx/dtp come back for dD/dA.
    dacc_x, dB4, dC4, ddt_raw, dmass, gx, dtp = _ssd_dir_bwd_kernel_call(
        accx, dt, A, accB.reshape(R, L, NG, N), accC.reshape(R, L, NG, N),
        Dsk, dtb, fentry, dy.astype(xi.dtype), chunk, reverse,
        pre_silu=True)
    dA = jnp.einsum("rlh,rlh->h", dmass, dtp).astype(A.dtype)
    ddtb = jnp.sum(ddt_raw, axis=(0, 1)).astype(dtb.dtype)
    dD = jnp.sum(gx, axis=(0, 1)).astype(Dsk.dtype)

    # --- depthwise-conv transposes (linear; XLA conv-transpose) ------------
    def conv_bwd(dacc, inp, w, b):
        fn = lambda x_, w_, b_: depthwise_conv_xla(
            x_, w_, b_, activation=None, anticausal=reverse)
        _, vjp = jax.vjp(fn, inp.astype(f32), w.astype(f32), b.astype(f32))
        return vjp(dacc)

    dxi, dcxw, dcxb = conv_bwd(dacc_x, xi, cxw, cxb)
    dBraw, dcbw, dcbb = conv_bwd(dB4.reshape(R, L, NGN), Braw, cbw, cbb)
    dCraw, dccw, dccb = conv_bwd(dC4.reshape(R, L, NGN), Craw, ccw, ccb)

    return (dxi.astype(xi.dtype), dz, dBraw.astype(Braw.dtype),
            dCraw.astype(Craw.dtype), ddt_raw.astype(dt.dtype),
            dcxw.astype(cxw.dtype), dcxb.astype(cxb.dtype),
            dcbw.astype(cbw.dtype), dcbb.astype(cbb.dtype),
            dccw.astype(ccw.dtype), dccb.astype(ccb.dtype),
            dnw.astype(nw.dtype), dA, dD, ddtb)


_interior.defvjp(_interior_fwd, _interior_bwd)


def mamba2_mixer_interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw,
                          ccb, nw, A, Dsk, dtb, *, d_state: int, eps: float,
                          chunk: int, reverse: bool) -> jax.Array:
    """One direction of the mamba2 mixer interior (see module docstring).

    xi/z [R, L, di]; Braw/Craw [R, L, NG*N]; dt [R, L, H] raw;
    cxw [di, K]/cbw/ccw [NG*N, K] conv taps (tap K-1 = current step);
    nw [di] gated-RMS-norm weight; A/Dsk/dtb [H]. Returns u [R, L, di] —
    everything up to (but excluding) out_proj.

    Fully differentiable: under grad the forward re-runs as the
    residual-emitting kernel and the backward chains the Pallas SSD adjoint
    with the conv/norm transposes (see module docstring) — the training
    path, not just inference.
    """
    chunk = _fit_chunk(chunk, xi.shape[1], xi.shape[2])
    return _interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb,
                     nw, A, Dsk, dtb, d_state, eps, chunk, reverse)


# Width cap (r5): the interior kernel's scoped-VMEM footprint scales with
# chunk*d_inner ([T, di] conv/gate/residual tiles + the [N, di] state).
# Measured on v5e: d_inner 2048 x chunk 128 fits (pc2-medium-ssd trains);
# d_inner 3072 x chunk 128 (pc2-large-ssd width) overflows scoped VMEM at
# compile in the residual-emitting training forward. SSD chunking is
# mathematically exact at any divisor chunk, so wide lanes just halve the
# time chunk until they fit; fwd and bwd both resolve through
# mamba2_mixer_interior's clamp, so residual chunking always matches.
MIXER2_FIT_ELEMS = 2048 * 128


def _fit_chunk(chunk: int, L: int, di: int) -> int:
    c = min(chunk, L)
    while c > 32 and c * di > MIXER2_FIT_ELEMS and L % (c // 2) == 0:
        c //= 2
    return c
