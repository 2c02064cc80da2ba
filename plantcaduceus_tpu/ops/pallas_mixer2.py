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

Backward: custom VJP through the decomposed XLA ops (depthwise_conv_xla +
ssd_chunked + rms_norm) — all matmul/elementwise-shaped, so XLA autodiff is
the production backward; the forward kernel is what removes the HBM passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops.pallas_ssd import ssd_chunk_core


def _conv_silu(xin, tail, w, b, K: int, T: int, reverse: bool):
    """Depthwise conv + silu of one chunk. xin [T, C], tail [K-1, C] from
    the previously processed chunk, w [K, C] (tap K-1 = current step),
    b [1, C]."""
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
    acc = acc + b.astype(f32)
    return acc * jax.nn.sigmoid(acc)


def _fused_kernel(dtb_ref, A_ref, D_ref, cxw_ref, cxb_ref, cbw_ref, cbb_ref,
                  ccw_ref, ccb_ref, nw_ref, xi_ref, z_ref, B_ref, C_ref,
                  dt_ref, u_ref, S_scr, xt_scr, bt_scr, ct_scr,
                  *, T: int, H: int, P: int, NG: int, N: int, K: int,
                  reverse: bool, eps: float, out_dtype):
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
    xc = _conv_silu(xi, xt, cxw_ref[...], cxb_ref[...], K, T, reverse)
    Bc = _conv_silu(Br, bt, cbw_ref[...], cbb_ref[...], K, T, reverse)
    Cc = _conv_silu(Cr, ct, ccw_ref[...], ccb_ref[...], K, T, reverse)

    y = ssd_chunk_core(
        xc, dt_ref[0], Bc.reshape(T, NG, N), Cc.reshape(T, NG, N),
        dtb_ref[...], A_ref[...], D_ref[...], S_scr,
        T=T, H=H, P=P, NG=NG, N=N, reverse=reverse,
        out_dtype=jnp.float32, mm=mm)              # [T, di] fp32

    z = z_ref[0].astype(jnp.float32)
    u = y * (z * jax.nn.sigmoid(z))
    ms = jnp.mean(u * u, axis=1, keepdims=True)    # [T, 1]
    u = u * jax.lax.rsqrt(ms + eps) * nw_ref[...].astype(jnp.float32)
    u_ref[0] = u.astype(out_dtype)


def _interior_pallas_call(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw,
                          ccb, nw, A, Dsk, dtb, *, N: int, eps: float,
                          chunk: int, reverse: bool):
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
        eps=eps, out_dtype=xi.dtype)
    f32 = jnp.float32
    const = lambda shape: pl.BlockSpec(shape, lambda r, c: (0,) * len(shape))
    return pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, T, di), lambda r, c: (*cidx(r, c), 0)),
        out_shape=jax.ShapeDtypeStruct((R, L, di), xi.dtype),
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
    out = _interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
                    A, Dsk, dtb, N, eps, chunk, reverse)
    return out, (xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb, nw,
                 A, Dsk, dtb)


def _interior_bwd(N, eps, chunk, reverse, res, g):
    f = functools.partial(_interior_xla, N=N, eps=eps, chunk=chunk,
                          reverse=reverse)
    return jax.vjp(f, *res)[1](g)


_interior.defvjp(_interior_fwd, _interior_bwd)


def mamba2_mixer_interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw,
                          ccb, nw, A, Dsk, dtb, *, d_state: int, eps: float,
                          chunk: int, reverse: bool) -> jax.Array:
    """One direction of the mamba2 mixer interior (see module docstring).

    xi/z [R, L, di]; Braw/Craw [R, L, NG*N]; dt [R, L, H] raw;
    cxw [di, K]/cbw/ccw [NG*N, K] conv taps (tap K-1 = current step);
    nw [di] gated-RMS-norm weight; A/Dsk/dtb [H]. Returns u [R, L, di] —
    everything up to (but excluding) out_proj.
    """
    return _interior(xi, z, Braw, Craw, dt, cxw, cxb, cbw, cbb, ccw, ccb,
                     nw, A, Dsk, dtb, d_state, eps, chunk, reverse)
