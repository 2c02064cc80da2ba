"""Pallas TPU kernel for the SSD (Mamba-2) recurrence.

Why a kernel: the XLA chunked formulation (ops/ssd.py) is matmul-shaped but
HBM-bound on the *inter-chunk state*: with N=128, P=128 the per-row state is
[H, N, P] = 1 MB — the lax.scan over chunk states reads/writes hundreds of
MB per layer and measured 67 of 90 ms/layer at l32 shapes (tools/sweep_ssd
ablation). Here the state lives in a VMEM scratch across the chunk grid;
HBM traffic is exactly the kernel inputs/outputs.

Per (row, chunk) grid step, with T = chunk = 128 and per-head dims
N = P = 128 (full MXU tiles):

    dt'    = softplus(dt + dt_bias)            [T, H]  (fp32, VPU)
    cum    = cumsum(dt' * A)                   [T, H]
    GBC    = C @ Bᵀ                            [T, T]  per group   (MXU)
    per head h:
      scores = GBC * exp(seg_h) * dt'[s]       [T, T]  (VPU, VMEM-resident)
      y      = scores @ x_h                    [T, P]  (MXU)
             + (C @ S_h) * exp(into_h)         [T, P]  (MXU)
      S_h    = exp(total_h) * S_h + wᵀ @ x_h   [N, P]  (MXU, fp32 scratch)

The reverse (anticausal) direction reverses the chunk-grid index maps and
uses the exclusive/suffix cumulative decays — no time flip of any HBM
tensor, mirroring ops/pallas_scan.py's reverse mode. The backward pass is a
custom VJP that differentiates the XLA chunked formulation (recompute-based;
the SSD backward is matmul-shaped too, so XLA handles it — unlike the
Mamba-1 scan, no hand-written adjoint kernel is required for usable speed).

Shapes (group axis G = directions, same contract as ops/ssd.py but x/y are
flat [G, B, L, H*P]):

    x       [G, B, L, H*P]   bf16 or fp32
    dt      [G, B, L, H]
    A       [G, H]           fp32 (negative)
    Bm, Cm  [G, B, L, NG, N]
    Dskip   [G, H]
    dt_bias [G, H]
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def ssd_chunk_core(x, dt_raw, Bc, Cc, dtb, A, Dsk, S_scr, *,
                   T: int, H: int, P: int, NG: int, N: int,
                   reverse: bool, out_dtype, mm=None):
    """One chunk of the SSD recurrence on in-VMEM values.

    x [T, H*P], dt_raw [T, H] (pre-bias), Bc/Cc [T, NG, N], dtb/A/Dsk
    [1, H]; S_scr: [N, H*P] fp32 scratch ref carrying the state across
    chunks (caller resets it at the first chunk). Returns y [T, H*P] cast to
    ``out_dtype``. Shared by the plain SSD kernel and the fused mixer
    kernel (ops/pallas_mixer2.py)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)

    dtp = jax.nn.softplus(
        dt_raw.astype(jnp.float32) + dtb.astype(jnp.float32))
    # Base-2 log-decay: exp2 lowers cheaper than exp on the VPU (same trick
    # as ops/pallas_scan.py's discretisation), so every decay below is exp2.
    la = dtp * (A.astype(jnp.float32) * LOG2E)     # [T, H], negative
    # Inclusive prefix sum as a lower-triangular-ones matmul: cumsum has no
    # Pallas TPU lowering, and the dot runs on the otherwise-idle MXU.
    cum = jax.lax.dot_general(
        (row >= col).astype(jnp.float32), la, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [T, H]
    total = jnp.sum(la, axis=0)                    # [H] (== cum[-1])

    if not reverse:
        # decay(t←s) = exp(cum[t]-cum[s]), s <= t; into = cum (from chunk
        # start); outof = total - cum (to chunk end).
        segbase = cum
        into = cum
        outof = total[None, :] - cum
    else:
        # Anticausal (h[t] = a[t] h[t+1] + b[t]): exclusive cumsum e;
        # decay(t←s) = exp(e[s]-e[t]), s >= t; boundary state arrives from
        # the chunk END (into = suffix sum), leaves to the chunk START.
        e = cum - la
        segbase = -e
        into = total[None, :] - e
        outof = e

    mask = (row >= col) if not reverse else (row <= col)

    if mm is None:
        mm = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    hg = H // NG

    # Mosaic has no single-lane gather: per-head columns/rows come from
    # static 2-D lax.slice, with one [T,H] -> [H,T] transpose per chunk for
    # the row-vector views.
    segbase_T = jnp.transpose(segbase)             # [H, T]
    tot2 = total.reshape(1, H)
    into_e = jnp.exp2(into)                        # [T, H]
    scale = jnp.exp2(outof)                        # [T, H]

    def col(m, h):  # [T, 1]
        return jax.lax.slice(m, (0, h), (T, h + 1))

    def rowv(mT, h):  # [1, T]
        return jax.lax.slice(mT, (h, 0), (h + 1, T))

    y_out = []
    for g in range(NG):
        Bg = Bc[:, g, :]                           # [T, N]
        Cg = Cc[:, g, :]
        GBC = jax.lax.dot_general(
            Cg.astype(mm), Bg.astype(mm), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [T, T] = C[t]·B[s]

        # Inter-chunk: ONE [T,N]@[N,hg*P] dot (C is shared across the
        # group's heads — merging the per-head dots was the main kernel
        # win, 3x; per-head [N,P] dots left the MXU mostly idle).
        sl = slice(g * hg * P, (g + 1) * hg * P)
        S_g = S_scr[:, sl]                         # [N, hg*P] fp32
        y_int = jax.lax.dot_general(
            Cg.astype(mm), S_g.astype(mm), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [T, hg*P]

        ys, xs = [], []
        for j in range(hg):
            h = g * hg + j
            # seg[t, s] = sb[t] - sb[s] (both directions fold into segbase).
            seg = col(segbase, h) - rowv(segbase_T, h)
            scores = GBC * jnp.exp2(jnp.where(mask, seg, -jnp.inf))
            # dt'[s] scales score COLUMNS — fold it into x instead (one
            # [T,P] multiply replaces a [T,T] one, and the states dot
            # needs dt'-scaled x anyway).
            xdt_h = (x[:, h * P:(h + 1) * P].astype(jnp.float32)
                     * col(dtp, h))                # [T, P]
            y_h = jax.lax.dot_general(
                scores.astype(mm), xdt_h.astype(mm), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y_h = y_h + y_int[:, j * P:(j + 1) * P] * col(into_e, h)
            # D-skip in-kernel: saves a full read-modify-write HBM pass.
            y_h = y_h + x[:, h * P:(h + 1) * P].astype(jnp.float32) * \
                jax.lax.slice(Dsk, (0, h), (1, h + 1))
            ys.append(y_h.astype(out_dtype))
            xs.append((xdt_h * col(scale, h)).astype(mm))

        # State update: ONE [N,T]@[T,hg*P] dot over the decay-scaled x.
        states = jax.lax.dot_general(
            Bg.astype(mm), jnp.concatenate(xs, axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [N, hg*P]
        tot_g = jnp.exp2(jax.lax.slice(tot2, (0, g * hg), (1, (g + 1) * hg)))
        tot_rep = jnp.broadcast_to(
            tot_g.reshape(1, hg, 1), (1, hg, P)).reshape(1, hg * P)
        S_scr[:, sl] = tot_rep * S_g + states
        y_out.append(jnp.concatenate(ys, axis=1))
    return jnp.concatenate(y_out, axis=1) if NG > 1 else y_out[0]


def _kernel(dtb_ref, A_ref, D_ref, x_ref, dt_ref, B_ref, C_ref, y_ref, S_scr,
            *, T: int, H: int, P: int, NG: int, N: int, nc: int,
            reverse: bool, out_dtype):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        S_scr[:] = jnp.zeros_like(S_scr)

    y_ref[0] = ssd_chunk_core(
        x_ref[0], dt_ref[0], B_ref[0], C_ref[0], dtb_ref[...], A_ref[...],
        D_ref[...], S_scr, T=T, H=H, P=P, NG=NG, N=N, reverse=reverse,
        out_dtype=out_dtype)


def _ssd_pallas_one(xf, dt, A, Bm, Cm, Dskip, dt_bias, chunk: int,
                    reverse: bool):
    """One direction. xf [R, L, H*P] flat; dt [R, L, H] raw (bias+softplus
    in-kernel); Bm/Cm [R, L, NG, N]."""
    R, L, HP = xf.shape
    H = dt.shape[-1]
    P = HP // H
    NG, N = Bm.shape[-2:]
    T = min(chunk, L)
    nc = L // T

    cidx = (lambda r, c: (r, nc - 1 - c)) if reverse else (lambda r, c: (r, c))
    kern = functools.partial(
        _kernel, T=T, H=H, P=P, NG=NG, N=N, nc=nc, reverse=reverse,
        out_dtype=xf.dtype)
    return pl.pallas_call(
        kern,
        grid=(R, nc),
        in_specs=[
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # dt_bias
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # A
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # D
            pl.BlockSpec((1, T, HP), lambda r, c: (*cidx(r, c), 0)),
            pl.BlockSpec((1, T, H), lambda r, c: (*cidx(r, c), 0)),
            pl.BlockSpec((1, T, NG, N), lambda r, c: (*cidx(r, c), 0, 0)),
            pl.BlockSpec((1, T, NG, N), lambda r, c: (*cidx(r, c), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, HP), lambda r, c: (*cidx(r, c), 0)),
        out_shape=jax.ShapeDtypeStruct((R, L, HP), xf.dtype),
        scratch_shapes=[pltpu.VMEM((N, H * P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(dt_bias.reshape(1, H).astype(jnp.float32),
      A.reshape(1, H).astype(jnp.float32),
      Dskip.reshape(1, H).astype(jnp.float32), xf, dt, Bm, Cm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ssd_dir(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    """One direction on FLAT tensors — the production mixer entry point.

    x [R, L, H*P], dt [R, L, H] (raw; bias+softplus in-kernel), A/Dskip/
    dt_bias [H], Bm/Cm [R, L, NG, N] -> y [R, L, H*P]. Taking flat x/y and
    doing bias/softplus/D-skip in-kernel keeps the wrapper free of
    reshape/slice/stack HBM passes, which profiled at 2x the kernel's own
    time in the first [G,B,L,H,P]-shaped API (tools/tpuprof.py)."""
    return _ssd_pallas_one(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse)


def _ssd_dir_xla(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    from plantcaduceus_tpu.ops.ssd import ssd_chunked

    R, L, HP = x.shape
    H = dt.shape[-1]
    y = ssd_chunked(x.reshape(1, R, L, H, HP // H), dt[None], A[None],
                    Bm[None], Cm[None], Dskip[None], dt_bias=dt_bias[None],
                    chunk=chunk, directions=(reverse,))
    return y.reshape(R, L, HP)


def _ssd_dir_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    return ssd_dir(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse), \
        (x, dt, A, Bm, Cm, Dskip, dt_bias)


def _ssd_dir_bwd(chunk, reverse, res, g):
    """Adjoint through the XLA chunked formulation (matmul-shaped; see
    module docstring)."""
    f = functools.partial(_ssd_dir_xla, chunk=chunk, reverse=reverse)
    return jax.vjp(f, *res)[1](g)


ssd_dir.defvjp(_ssd_dir_fwd, _ssd_dir_bwd)


def supported(x_shape, A_shape, B_shape, chunk: int) -> bool:
    """Whether the kernel handles these shapes (else use ops/ssd.py)."""
    G, B, L, H, P = x_shape
    NG, N = B_shape[-2:]
    T = min(chunk, L)
    return (P % 128 == 0 and N % 128 == 0 and T % 128 == 0
            and L % T == 0)


def ssd_pallas(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    chunk: int = 128,
    directions: Sequence[bool] = (False,),
) -> jax.Array:
    """ops.ssd.ssd_chunked-compatible wrapper (x [G, B, L, H, P]) over the
    per-direction flat entry point :func:`ssd_dir`. Tests/compat only — the
    mixer calls ssd_dir directly to avoid the stack/slice HBM passes."""
    del dt_softplus  # always softplus; kept for signature parity
    G, B, L, H, P = x.shape
    dtb = dt_bias if dt_bias is not None else jnp.zeros((G, H))
    ys = []
    for g in range(G):
        rev = bool(directions[g]) if g < len(directions) else False
        ys.append(ssd_dir(x[g].reshape(B, L, H * P), dt[g], A[g], Bm[g],
                          Cm[g], Dskip[g], dtb[g], chunk, rev))
    return jnp.stack(ys).reshape(G, B, L, H, P)
