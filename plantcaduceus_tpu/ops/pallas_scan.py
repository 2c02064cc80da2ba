"""Pallas TPU kernel for the selective scan.

Replaces the reference's ``selective_scan_cuda`` (mamba-ssm CUDA wheel) with
a chunked scan that never materialises the ``[B, L, D, N]`` state tensors in
HBM — the associative-scan JAX fallback's weakness (it OOMs a 16 GB chip at
batch 128 for l20). HBM traffic is exactly the kernel inputs/outputs
(``x, dt, y: [*, L, D]`` and ``B, C: [*, L, N]``); all state lives in VMEM.

Layout and scheduling (tuned on TPU v5e, tools/sweep_scan.py):

* Compute tensors are ``[bb, T, N, bd]``: the channel block (bd) rides the
  128-wide lane dimension, the small state axis N sits on sublanes, and
  ``bb`` batch rows can be folded per grid step. The v5e sweep shows the
  kernel is *throughput*-bound at the fp32 VPU peak (~230 Gstates/s ≈
  1.9 TFLOP/s at ~8 fp32 ops/state), not latency-bound: bb=1 with a large
  time block (bl=256, bd=256) is fastest, and the [1, N, bd] recurrence
  step already saturates the vector unit.
* The recurrence runs as a plain unrolled sequential loop over time
  (t_inner=1). Hillis-Steele windows (t_inner>1) are implemented but lose on
  v5e: the 3*log2(T) extra vector ops cost more than the latency they hide.
* Grid is (rows/bb, D/bd, L/bl) with the L axis innermost; the fp32 carry
  persists across L-chunks in a VMEM scratch (TPU grid iteration is
  sequential over the innermost dim).
* dt-bias + softplus + discretisation (exp) fuse into the kernel prologue;
  the D-skip and C-contraction fuse into the epilogue.

Chunk-entry states are emitted as a side output ``[rows, n_chunks, D, N]``
so a backward pass can recompute intra-chunk states chunk-locally.
``selective_scan_pallas`` carries a custom VJP whose backward currently
recomputes through the pure-JAX associative formulation (correct; a
dedicated reverse-scan kernel is the planned upgrade).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BL = 256        # time-steps per grid step
DEF_BD = 256        # channels per grid step (lane axis)
DEF_BB = 1          # batch rows per grid step (v5e sweep: bb>1 never wins)
DEF_T_INNER = 1     # sequential recurrence (Hillis-Steele window if >1)


def _fwd_kernel(dtb_ref, A_ref, Dsk_ref, x_ref, dt_ref, B_ref, C_ref,
                y_ref, hb_ref, h_scr, *, t_inner: int):
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    x = x_ref[...].astype(jnp.float32)        # [bb, bl, bd]
    dt = dt_ref[...].astype(jnp.float32)      # [bb, bl, bd]
    Bm = B_ref[...].astype(jnp.float32)       # [bb, bl, N]
    Cm = C_ref[...].astype(jnp.float32)       # [bb, bl, N]
    At = A_ref[0].astype(jnp.float32).T       # [N, bd]
    dtb = dtb_ref[0, 0].astype(jnp.float32)   # [bd]
    dsk = Dsk_ref[0, 0].astype(jnp.float32)   # [bd]

    bb, bl, bd = x.shape
    N = Bm.shape[-1]

    # chunk-entry state (before this L-chunk) for the backward pass
    hb_ref[:, 0] = jnp.swapaxes(h_scr[...], 1, 2)  # [bb, bd, N]

    dtp = jax.nn.softplus(dt + dtb[None, None, :])           # [bb, bl, bd]
    a = jnp.exp(dtp[:, :, None, :] * At[None, None])         # [bb, bl, N, bd]
    b = (dtp * x)[:, :, None, :] * Bm[..., None]             # [bb, bl, N, bd]

    if t_inner > 1:
        # Hillis-Steele inclusive scan within windows of t_inner steps.
        C_out = bl // t_inner
        a = a.reshape(bb * C_out, t_inner, N, bd)
        b = b.reshape(bb * C_out, t_inner, N, bd)
        s = 1
        while s < t_inner:
            a_sh = jnp.concatenate(
                [jnp.ones((bb * C_out, s, N, bd), jnp.float32), a[:, :-s]],
                axis=1)
            b_sh = jnp.concatenate(
                [jnp.zeros((bb * C_out, s, N, bd), jnp.float32), b[:, :-s]],
                axis=1)
            b = b + a * b_sh
            a = a * a_sh
            s *= 2
        a = a.reshape(bb, bl, N, bd)
        b = b.reshape(bb, bl, N, bd)

    # Sequential carry across windows (and across L-chunks via scratch).
    h0 = h_scr[...]                                          # [bb, N, bd]
    hs = []
    for c in range(0, bl, t_inner):
        hc = b[:, c : c + t_inner] + a[:, c : c + t_inner] * h0[:, None]
        h0 = hc[:, t_inner - 1]
        hs.append(hc)
    h_scr[...] = h0
    h = jnp.concatenate(hs, axis=1)                          # [bb, bl, N, bd]

    y = jnp.sum(h * Cm[..., None], axis=2)                   # [bb, bl, bd]
    y = y + x * dsk[None, None, :]
    y_ref[...] = y.astype(y_ref.dtype)


def _pick_bb(R: int, B: int, G: int, bb: int) -> int:
    """Largest batch block <= bb that tiles the row axis without straddling
    direction groups (per-group params are selected per block)."""
    lim = B if G > 1 else R
    while bb > 1 and lim % bb:
        bb //= 2
    return max(bb, 1)


def _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias,
                     bl: int, bd: int, t_inner: int, bb: int):
    G, B, L, D = x.shape
    R = G * B
    N = A.shape[-1]
    bl = min(bl, L)
    bd = min(bd, D)
    bb = _pick_bb(R, B, G, bb)
    if L % bl or D % bd or bl % t_inner:
        raise ValueError(f"shape not tileable: L={L} bl={bl} D={D} bd={bd}")
    nl, nd = L // bl, D // bd

    xf = x.reshape(R, L, D)
    dtf = dt.reshape(R, L, D)
    Bf = Bm.reshape(R, L, N)
    Cf = Cm.reshape(R, L, N)

    grid = (R // bb, nd, nl)

    def pmap(r, d, l):  # params indexed by group g = first-row // B
        return ((r * bb) // B, 0, d)

    def amap(r, d, l):
        return ((r * bb) // B, d, 0)

    kernel = functools.partial(_fwd_kernel, t_inner=t_inner)
    y, hb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bd), pmap),                            # dt_bias
            pl.BlockSpec((1, bd, N), amap),                            # A
            pl.BlockSpec((1, 1, bd), pmap),                            # Dskip
            pl.BlockSpec((bb, bl, bd), lambda r, d, l: (r, l, d)),     # x
            pl.BlockSpec((bb, bl, bd), lambda r, d, l: (r, l, d)),     # dt
            pl.BlockSpec((bb, bl, N), lambda r, d, l: (r, l, 0)),      # B
            pl.BlockSpec((bb, bl, N), lambda r, d, l: (r, l, 0)),      # C
        ],
        out_specs=[
            pl.BlockSpec((bb, bl, bd), lambda r, d, l: (r, l, d)),     # y
            pl.BlockSpec((bb, 1, bd, N), lambda r, d, l: (r, l, d, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, L, D), x.dtype),
            jax.ShapeDtypeStruct((R, nl, D, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, N, bd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(dt_bias[:, None, :], A, Dskip[:, None, :], xf, dtf, Bf, Cf)
    return y.reshape(G, B, L, D), hb


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _scan_op(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner, bb):
    y, _ = _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias,
                            bl, bd, t_inner, bb)
    return y


def _scan_op_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner, bb):
    y, _ = _pallas_scan_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias,
                            bl, bd, t_inner, bb)
    return y, (x, dt, A, Bm, Cm, Dskip, dt_bias)


def _scan_op_bwd(bl, bd, t_inner, bb, res, gy):
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
    bb: int = DEF_BB,
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
    return _scan_op(x, dt, A, Bm, Cm, Dskip, dt_bias, bl, bd, t_inner, bb)
