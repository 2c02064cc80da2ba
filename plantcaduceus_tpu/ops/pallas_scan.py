"""Pallas TPU kernel for the selective scan.

Replaces the reference's ``selective_scan_cuda`` (mamba-ssm CUDA wheel) with
a chunked parallel prefix scan that never materialises the ``[B, L, D, N]``
state tensors in HBM — the associative-scan JAX fallback's weakness (it OOMs
a 16 GB chip at batch 128 for l20). HBM traffic is exactly the kernel
inputs/outputs (``x, dt, y: [*, L, D]`` and ``B, C: [*, L, N]``); all state
lives in VMEM.

Layout: compute tensors are shaped ``[T, N, bd]`` inside the kernel so the
channel block (bd = 128/256) rides the 128-wide lane dimension and the small
state axis N sits on sublanes — a ``[*, N]``-last layout would waste 7/8 of
every vector. The time axis is untiled, so shifted slices along it (the
Hillis–Steele steps) are relayout-free.

Scan structure per (row, channel-block, L-chunk) grid step:
  1. fuse dt-bias + softplus + discretisation: a = exp(dt'·A), b = dt'·B·x
  2. Hillis–Steele inclusive scan along an inner window T_INNER (log2 T
     vector steps),
  3. sequential carry across the bl/T_INNER windows and across L-chunks via
     an fp32 VMEM scratch carry — TPU grid iteration is sequential over the
     innermost grid dim, so the scratch persists,
  4. contract the state against C, add the D skip, emit y in x.dtype.

The chunk-entry states are emitted as a side output ``[rows, n_chunks, D, N]``
so a backward pass can recompute intra-chunk states chunk-locally (the
classic chunked-recompute trade: L/bl boundary states instead of L states).

Gradients: ``selective_scan_pallas`` carries a custom VJP whose backward
currently recomputes through the pure-JAX associative formulation (correct,
memory-hungrier); a dedicated reverse-scan Pallas kernel is the planned
upgrade (see ops/pallas_scan_bwd plan in SURVEY.md §7.2 step 5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BL = 128        # time-steps per grid step
DEF_BD = 256        # channels per grid step (lane axis)
DEF_T_INNER = 32    # Hillis-Steele window; carry chains across windows


def _fwd_kernel(dtb_ref, A_ref, Dsk_ref, x_ref, dt_ref, B_ref, C_ref,
                y_ref, hb_ref, h_scr, *, t_inner: int):
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    x = x_ref[0].astype(jnp.float32)        # [bl, bd]
    dt = dt_ref[0].astype(jnp.float32)      # [bl, bd]
    Bm = B_ref[0].astype(jnp.float32)       # [bl, N]
    Cm = C_ref[0].astype(jnp.float32)       # [bl, N]
    At = A_ref[0].astype(jnp.float32).T     # [N, bd]
    dtb = dtb_ref[0, 0].astype(jnp.float32)  # [bd]
    dsk = Dsk_ref[0, 0].astype(jnp.float32)  # [bd]

    bl, bd = x.shape
    N = Bm.shape[-1]

    # chunk-entry state (before this L-chunk) for the backward pass
    hb_ref[0, 0] = h_scr[:].T               # [bd, N]

    dtp = jax.nn.softplus(dt + dtb[None, :])            # [bl, bd]
    a = jnp.exp(dtp[:, None, :] * At[None])             # [bl, N, bd]
    b = (dtp * x)[:, None, :] * Bm[..., None]           # [bl, N, bd]

    # Hillis-Steele within windows of t_inner steps.
    C_out = bl // t_inner
    a = a.reshape(C_out, t_inner, N, bd)
    b = b.reshape(C_out, t_inner, N, bd)
    s = 1
    while s < t_inner:
        a_sh = jnp.concatenate(
            [jnp.ones((C_out, s, N, bd), jnp.float32), a[:, :-s]], axis=1)
        b_sh = jnp.concatenate(
            [jnp.zeros((C_out, s, N, bd), jnp.float32), b[:, :-s]], axis=1)
        b = b + a * b_sh
        a = a * a_sh
        s *= 2

    # Sequential carry across windows (and across L-chunks via scratch).
    h0 = h_scr[:]                                       # [N, bd]
    hs = []
    for c in range(C_out):
        hc = b[c] + a[c] * h0[None]                     # [t_inner, N, bd]
        h0 = hc[t_inner - 1]
        hs.append(hc)
    h_scr[:] = h0
    h = jnp.concatenate(hs, axis=0)                     # [bl, N, bd]

    y = jnp.sum(h * Cm[:, :, None], axis=1)             # [bl, bd]
    y = y + x * dsk[None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias,
                     bl: int, bd: int, t_inner: int):
    """Flattened-row pallas call. x/dt: [R, L, D]; A/Dskip/dt_bias: [R?, ...]
    handled by caller; here A etc. are already per-row-group indexed."""
    G, B, L, D = x.shape
    R = G * B
    N = A.shape[-1]
    bl = min(bl, L)
    bd = min(bd, D)
    if L % bl or D % bd or bl % t_inner:
        raise ValueError(f"shape not tileable: L={L} bl={bl} D={D} bd={bd}")
    nl, nd = L // bl, D // bd

    xf = x.reshape(R, L, D)
    dtf = dt.reshape(R, L, D)
    Bf = Bm.reshape(R, L, N)
    Cf = Cm.reshape(R, L, N)

    grid = (R, nd, nl)

    def gmap(r, d, l):  # for [G, ...] params
        return (r // B, d, 0)

    kernel = functools.partial(_fwd_kernel, t_inner=t_inner)
    y, hb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bd), lambda r, d, l: (r // B, 0, d)),  # dt_bias
            pl.BlockSpec((1, bd, N), gmap),                            # A
            pl.BlockSpec((1, 1, bd), lambda r, d, l: (r // B, 0, d)),  # Dskip
            pl.BlockSpec((1, bl, bd), lambda r, d, l: (r, l, d)),      # x
            pl.BlockSpec((1, bl, bd), lambda r, d, l: (r, l, d)),      # dt
            pl.BlockSpec((1, bl, N), lambda r, d, l: (r, l, 0)),       # B
            pl.BlockSpec((1, bl, N), lambda r, d, l: (r, l, 0)),       # C
        ],
        out_specs=[
            pl.BlockSpec((1, bl, bd), lambda r, d, l: (r, l, d)),      # y
            pl.BlockSpec((1, 1, bd, N), lambda r, d, l: (r, l, d, 0)),  # h entry
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, L, D), x.dtype),
            jax.ShapeDtypeStruct((R, nl, D, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, bd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(dt_bias[:, None, :], A, Dskip[:, None, :], xf, dtf, Bf, Cf)
    return y.reshape(G, B, L, D), hb


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_op(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner):
    y, _ = _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner)
    return y


def _scan_op_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner):
    y, _ = _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner)
    return y, (x, dt, A, Bm, Cm, Dskip, dt_bias)


def _scan_op_bwd(bl, bd, t_inner, res, gy):
    # Interim backward: recompute via the associative formulation (pure JAX).
    from plantcaduceus_tpu.ops.selective_scan import selective_scan_associative

    x, dt, A, Bm, Cm, Dskip, dt_bias = res

    def f(x, dt, A, Bm, Cm, Dskip, dt_bias):
        return selective_scan_associative(x, dt, A, Bm, Cm, Dskip,
                                          dt_bias=dt_bias, dt_softplus=True)

    _, vjp = jax.vjp(f, x, dt, A, Bm, Cm, Dskip, dt_bias)
    return vjp(gy)


_scan_op.defvjp(_scan_op_fwd, _scan_op_bwd)


def selective_scan_pallas(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    bl: int = DEF_BL,
    bd: int = DEF_BD,
    t_inner: int = DEF_T_INNER,
) -> jax.Array:
    """Public entry, same contract as ops.selective_scan.selective_scan."""
    if not dt_softplus:
        raise NotImplementedError("pallas scan fuses softplus; dt_softplus=False "
                                  "is only available in the JAX impls")
    G = x.shape[0]
    if dt_bias is None:
        dt_bias = jnp.zeros((G, x.shape[-1]), jnp.float32)
    A = A.astype(jnp.float32)
    Dskip = Dskip.astype(jnp.float32)
    dt_bias = dt_bias.astype(jnp.float32)
    return _scan_op(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner)
