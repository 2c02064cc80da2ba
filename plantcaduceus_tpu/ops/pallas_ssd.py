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


def _kernel(dtb_ref, A_ref, D_ref, x_ref, dt_ref, B_ref, C_ref, *out_refs,
            T: int, H: int, P: int, NG: int, N: int, nc: int,
            reverse: bool, out_dtype, emit_fentry: bool):
    if emit_fentry:
        y_ref, fe_ref, S_scr = out_refs
    else:
        y_ref, S_scr = out_refs
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        S_scr[:] = jnp.zeros_like(S_scr)

    if emit_fentry:
        # Chunk-entry state for the backward kernel's chunk-local recompute
        # (the pattern of ops/pallas_scan.py's emit_hb).
        fe_ref[0, 0] = S_scr[...]

    y_ref[0] = ssd_chunk_core(
        x_ref[0], dt_ref[0], B_ref[0], C_ref[0], dtb_ref[...], A_ref[...],
        D_ref[...], S_scr, T=T, H=H, P=P, NG=NG, N=N, reverse=reverse,
        out_dtype=out_dtype)


def _ssd_pallas_one(xf, dt, A, Bm, Cm, Dskip, dt_bias, chunk: int,
                    reverse: bool, emit_fentry: bool = False):
    """One direction. xf [R, L, H*P] flat; dt [R, L, H] raw (bias+softplus
    in-kernel); Bm/Cm [R, L, NG, N]. With ``emit_fentry`` also returns the
    per-chunk entry states [R, nc, N, H*P] (training forward)."""
    R, L, HP = xf.shape
    H = dt.shape[-1]
    P = HP // H
    NG, N = Bm.shape[-2:]
    T = min(chunk, L)
    nc = L // T

    cidx = (lambda r, c: (r, nc - 1 - c)) if reverse else (lambda r, c: (r, c))
    kern = functools.partial(
        _kernel, T=T, H=H, P=P, NG=NG, N=N, nc=nc, reverse=reverse,
        out_dtype=xf.dtype, emit_fentry=emit_fentry)
    out_specs = [pl.BlockSpec((1, T, HP), lambda r, c: (*cidx(r, c), 0))]
    out_shape = [jax.ShapeDtypeStruct((R, L, HP), xf.dtype)]
    if emit_fentry:
        out_specs.append(
            pl.BlockSpec((1, 1, N, HP), lambda r, c: (*cidx(r, c), 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((R, nc, N, HP), jnp.float32))
    out = pl.pallas_call(
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
        out_specs=out_specs if emit_fentry else out_specs[0],
        out_shape=out_shape if emit_fentry else out_shape[0],
        scratch_shapes=[pltpu.VMEM((N, H * P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(dt_bias.reshape(1, H).astype(jnp.float32),
      A.reshape(1, H).astype(jnp.float32),
      Dskip.reshape(1, H).astype(jnp.float32), xf, dt, Bm, Cm)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ssd_dir(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    """One direction on FLAT tensors — the production mixer entry point.

    x [R, L, H*P], dt [R, L, H] (raw; bias+softplus in-kernel), A/Dskip/
    dt_bias [H], Bm/Cm [R, L, NG, N] -> y [R, L, H*P]. Taking flat x/y and
    doing bias/softplus/D-skip in-kernel keeps the wrapper free of
    reshape/slice/stack HBM passes, which profiled at 2x the kernel's own
    time in the first [G,B,L,H,P]-shaped API (tools/tpuprof.py)."""
    return _ssd_pallas_one(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse)


def ssd_dir_xla(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    """XLA (ops/ssd.py) evaluation of the :func:`ssd_dir` flat contract —
    the off-TPU fallback and the reference the kernel is tested against."""
    from plantcaduceus_tpu.ops.ssd import ssd_chunked

    R, L, HP = x.shape
    H = dt.shape[-1]
    y = ssd_chunked(x.reshape(1, R, L, H, HP // H), dt[None], A[None],
                    Bm[None], Cm[None], Dskip[None], dt_bias=dt_bias[None],
                    chunk=chunk, directions=(reverse,))
    return y.reshape(R, L, HP)


def _ssd_dir_fwd(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk, reverse):
    y, fentry = _ssd_pallas_one(x, dt, A, Bm, Cm, Dskip, dt_bias, chunk,
                                reverse, emit_fentry=True)
    return y, (x, dt, A, Bm, Cm, Dskip, dt_bias, fentry)


def _ssd_dir_bwd(chunk, reverse, res, g):
    """Hand-written Pallas adjoint (see _bwd_kernel): chunk-local recompute
    from the forward's emitted chunk-entry states, cotangent state carried
    in VMEM. Scalar-parameter grads (dA, dD, ddt_bias) assemble outside the
    kernel from the per-position outputs — cheap fused XLA reductions."""
    x, dt, A, Bm, Cm, Dskip, dt_bias, fentry = res
    dx, dB, dC, ddt_raw, dmass = _ssd_dir_bwd_kernel_call(
        x, dt, A, Bm, Cm, Dskip, dt_bias, fentry, g, chunk, reverse)
    R, L, HP = x.shape
    H = dt.shape[-1]
    dtp = jax.nn.softplus(dt.astype(jnp.float32)
                          + dt_bias.astype(jnp.float32))
    dA = jnp.einsum("rlh,rlh->h", dmass, dtp)
    ddtb = jnp.sum(ddt_raw, axis=(0, 1))
    gx = (g.astype(jnp.float32) * x.astype(jnp.float32)).reshape(
        R, L, H, HP // H)
    dD = jnp.sum(gx, axis=(0, 1, 3))
    return (dx.astype(x.dtype), ddt_raw.astype(dt.dtype), dA.astype(A.dtype),
            dB.astype(Bm.dtype), dC.astype(Cm.dtype), dD.astype(Dskip.dtype),
            ddtb.astype(dt_bias.dtype))


ssd_dir.defvjp(_ssd_dir_fwd, _ssd_dir_bwd)


def _bwd_kernel(dtb_ref, A_ref, D_ref, x_ref, dt_ref, B_ref, C_ref, g_ref,
                fe_ref, *out_refs,
                T: int, H: int, P: int, NG: int, N: int, nc: int,
                reverse: bool, mm, out_dtype, pre_silu: bool = False):
    """Adjoint of one SSD chunk. Direction-generic via the forward's
    segbase/into/outof/mask conventions; processes chunks in the opposite
    order to the forward, carrying the cotangent state Rv in VMEM and
    reading the forward's emitted chunk-entry states (fe_ref).

    Math (per head; Rv[s] = Σ_t decay(t,s) C[t]⊗g[t] over the "future"):
        dx̃[s] = scoresᵀ@g + exp2(outof[s])·B@Rv_exit     (x̃ = dt'·x)
        dB[s]  = M_sumᵀ@C + Σ_h exp2(outof)·(x̃@Rv_exitᵀ)
        dC[t]  = M_sum@B + Σ_h exp2(into)·(g@F_entryᵀ)
        mass[r] (= ∂L/∂ log-decay[r]) = P[r] - x̃[r]·dx̃[r], with
        P[r] = <Rv[r],F[r]> split into four bounded-exponent terms:
        chunk-local (masked column-sum of (K@maskᵀ)), entry (a masked
        cumsum of into_e·w), exit (masked cumsum of scale·v0), and
        entry×exit (exp2(total)·<Rv_exit,F_entry>).
    M_sum = Σ_h (g@x̃ᵀ)⊙segexp; every exponent above is ≤ 0.

    ``pre_silu`` mode (the fused-mixer training backward): x/B/C refs hold
    PRE-SiLU conv accumulators; SiLU re-applies in-kernel and the outgoing
    dx/dB/dC cotangents are multiplied by SiLU' — so the [R, L, *]
    silu-recompute and dacc-multiply tensors never exist in HBM, and extra
    gx/dtp outputs let the caller assemble dD/dA without its own passes.
    """
    rest = list(out_refs)
    dx_ref, dB_ref, dC_ref, ddt_ref, dm_ref = rest[:5]
    rest = rest[5:]
    if pre_silu:
        gx_ref, dtp_ref = rest[:2]
        rest = rest[2:]
    (Rv_scr,) = rest
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        Rv_scr[:] = jnp.zeros_like(Rv_scr)

    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    maskb = (row >= col) if not reverse else (row <= col)
    maskf = maskb.astype(f32)

    dt_raw = dt_ref[0].astype(f32)
    dtb = dtb_ref[...].astype(f32)
    A = A_ref[...].astype(f32)                     # [1, H], nat units
    dtp = jax.nn.softplus(dt_raw + dtb)            # [T, H]
    la = dtp * (A * LOG2E)
    cum = jax.lax.dot_general(
        (row >= col).astype(f32), la, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    total = jnp.sum(la, axis=0).reshape(1, H)
    if not reverse:
        segbase, into, outof = cum, cum, total - cum
    else:
        e = cum - la
        segbase, into, outof = -e, total - e, e
    into_e = jnp.exp2(into)                        # [T, H]
    scale = jnp.exp2(outof)
    tote = jnp.exp2(total)                         # [1, H]
    segbase_T = jnp.transpose(segbase)

    def colv(m, h):
        return jax.lax.slice(m, (0, h), (T, h + 1))

    def rowv(mT, h):
        return jax.lax.slice(mT, (h, 0), (h + 1, T))

    x = x_ref[0]
    g = g_ref[0]
    fe = fe_ref[0, 0]                              # [N, HP] fp32
    hg = H // NG

    cw, cv0, cmi, cdir, cxdx, csc, cgx = [], [], [], [], [], [], []
    for gi in range(NG):
        if pre_silu:
            accB = B_ref[0, :, gi, :].astype(f32)  # pre-SiLU accumulators
            Bf = accB * jax.nn.sigmoid(accB)
            accC = C_ref[0, :, gi, :].astype(f32)
            Cf = accC * jax.nn.sigmoid(accC)
            Bg, Cg = Bf, Cf
        else:
            Bg = B_ref[0, :, gi, :]                # [T, N]
            Cg = C_ref[0, :, gi, :]
            Bf, Cf = Bg.astype(f32), Cg.astype(f32)
        Bmm, Cmm = Bg.astype(mm), Cg.astype(mm)
        GBC = jax.lax.dot_general(
            Cmm, Bmm, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)            # [T(t), T(s)]

        sl = slice(gi * hg * P, (gi + 1) * hg * P)
        Rv_g = Rv_scr[:, sl]                       # [N, hg*P] fp32
        M_sum = jnp.zeros((T, T), f32)
        dxs, gss, dBacc, dCacc = [], [], 0.0, 0.0
        for j in range(hg):
            h = gi * hg + j
            seg = colv(segbase, h) - rowv(segbase_T, h)
            segexp = jnp.exp2(jnp.where(maskb, seg, -jnp.inf))
            scores = GBC * segexp
            if pre_silu:
                # Only the accumulator stays live across the head body;
                # sigmoids recompute at their use points — keeping all
                # three [T, P] f32 temporaries alive per unrolled head
                # overflowed the Mosaic stack at d_inner 2048 (measured:
                # 20.9M vs the 16M scoped-VMEM limit).
                accx_h = x[:, h * P:(h + 1) * P].astype(f32)
                x_h = accx_h * jax.nn.sigmoid(accx_h)
            else:
                x_h = x[:, h * P:(h + 1) * P].astype(f32)
            g_h = g[:, h * P:(h + 1) * P]
            xt_h = x_h * colv(dtp, h)              # x̃
            GXG = jax.lax.dot_general(
                g_h.astype(mm), xt_h.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)        # [T(t), T(s)]
            GXGseg = GXG * segexp
            M_sum = M_sum + GXGseg
            Kp = jax.lax.dot_general(
                (GBC * GXGseg).astype(mm), maskf.astype(mm),
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32)        # [T(t), T(r)]
            cmi.append(jnp.sum(Kp * maskf, axis=0).reshape(T, 1))

            F_h = fe[:, h * P:(h + 1) * P]         # [N, P]
            Rv_h = Rv_g[:, j * P:(j + 1) * P]
            gF = jax.lax.dot_general(
                g_h.astype(mm), F_h.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)        # [T, N]
            xRv = jax.lax.dot_general(
                xt_h.astype(mm), Rv_h.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)        # [T, N]
            cw.append(jnp.sum(Cf * gF, axis=1).reshape(T, 1))
            cv0.append(jnp.sum(Bf * xRv, axis=1).reshape(T, 1))
            csc.append(jnp.sum(Rv_h * F_h).reshape(1, 1))
            dCacc = dCacc + colv(into_e, h) * gF
            dBacc = dBacc + colv(scale, h) * xRv

            dxt = jax.lax.dot_general(
                scores.astype(mm), g_h.astype(mm), (((0,), (0,)), ((), ())),
                preferred_element_type=f32)        # [T(s), P]
            dxt = dxt + colv(scale, h) * jax.lax.dot_general(
                Bmm, Rv_h.astype(mm), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            cdir.append(jnp.sum(x_h * dxt, axis=1).reshape(T, 1))
            cxdx.append(jnp.sum(xt_h * dxt, axis=1).reshape(T, 1))
            dx_h = colv(dtp, h) * dxt + \
                jax.lax.slice(D_ref[...].astype(f32), (0, h), (1, h + 1)) * \
                g_h.astype(f32)
            if pre_silu:
                # chain through the in-kernel SiLU: emit d/d(acc), and the
                # g·x dot the caller's dD assembly needs
                sx_h = jax.nn.sigmoid(accx_h)
                dx_h = dx_h * (sx_h * (1.0 + accx_h * (1.0 - sx_h)))
                cgx.append(jnp.sum(g_h.astype(f32) * x_h,
                                   axis=1).reshape(T, 1))
            dxs.append(dx_h.astype(out_dtype))
            gss.append((g_h.astype(f32) * colv(into_e, h)).astype(mm))

        dB_g = jax.lax.dot_general(
            M_sum.astype(mm), Cmm, (((0,), (0,)), ((), ())),
            preferred_element_type=f32) + dBacc    # [T(s), N]
        dC_g = jax.lax.dot_general(
            M_sum.astype(mm), Bmm, (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + dCacc    # [T(t), N]
        if pre_silu:
            sB = jax.nn.sigmoid(accB)
            dB_g = dB_g * (sB * (1.0 + accB * (1.0 - sB)))
            sC = jax.nn.sigmoid(accC)
            dC_g = dC_g * (sC * (1.0 + accC * (1.0 - sC)))
        dB_ref[0, :, gi, :] = dB_g.astype(out_dtype)
        dC_ref[0, :, gi, :] = dC_g.astype(out_dtype)
        dx_ref[0, :, sl] = jnp.concatenate(dxs, axis=1)

        Rv_scr[:, sl] = tote_rep(tote, gi, hg, P) * Rv_g + \
            jax.lax.dot_general(
                Cmm, jnp.concatenate(gss, axis=1), (((0,), (0,)), ((), ())),
                preferred_element_type=f32)

    W = jnp.concatenate(cw, axis=1)                # [T, H]
    V0 = jnp.concatenate(cv0, axis=1)
    m_intra = jnp.concatenate(cmi, axis=1)
    ddirect = jnp.concatenate(cdir, axis=1)
    xdx = jnp.concatenate(cxdx, axis=1)
    scal = jnp.concatenate(csc, axis=1)            # [1, H]

    sum_up = jax.lax.dot_general(                  # Σ_{t: mask[t,r]} v[t]
        maskf.astype(mm), (into_e * W).astype(mm), (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    sum_dn = jax.lax.dot_general(                  # Σ_{s: mask[r,s]} v[s]
        maskf.astype(mm), (scale * V0).astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    Pterm = m_intra + sum_up + sum_dn + tote * scal
    mass = Pterm - xdx
    ddtp = ddirect + mass * A
    ddt_ref[0] = (jax.nn.sigmoid(dt_raw + dtb) * ddtp).astype(f32)
    dm_ref[0] = mass.astype(f32)
    if pre_silu:
        gx_ref[0] = jnp.concatenate(cgx, axis=1).astype(f32)   # [T, H]
        dtp_ref[0] = dtp.astype(f32)


def tote_rep(tote, gi, hg, P):
    t = jax.lax.slice(tote, (0, gi * hg), (1, (gi + 1) * hg))
    return jnp.broadcast_to(t.reshape(1, hg, 1), (1, hg, P)).reshape(1, hg * P)


def _ssd_dir_bwd_kernel_call(x, dt, A, Bm, Cm, Dskip, dt_bias, fentry, g,
                             chunk: int, reverse: bool,
                             pre_silu: bool = False):
    """-> (dx, dBm, dCm, ddt_raw, dmass[, gx, dtp]) via the backward Pallas
    kernel. With ``pre_silu`` the x/Bm/Cm arguments are PRE-SiLU conv
    accumulators (the fused-mixer training residuals): SiLU re-applies
    in-kernel, the returned dx/dBm/dCm are cotangents w.r.t. the
    accumulators (SiLU' chained in-kernel), and gx/dtp ship the Σ_P g·x and
    softplus(dt+bias) values the caller needs for dD/dA — no [R, L, *]
    silu-recompute or dacc-multiply passes in XLA."""
    R, L, HP = x.shape
    H = dt.shape[-1]
    P = HP // H
    NG, N = Bm.shape[-2:]
    T = min(chunk, L)
    nc = L // T
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    # Process chunks opposite to the forward order.
    fidx = (lambda c: nc - 1 - c) if reverse else (lambda c: c)
    bidx = lambda r, c: (r, fidx(nc - 1 - c))
    kern = functools.partial(
        _bwd_kernel, T=T, H=H, P=P, NG=NG, N=N, nc=nc, reverse=reverse,
        mm=mm, out_dtype=jnp.float32, pre_silu=pre_silu)
    out_specs = [
        pl.BlockSpec((1, T, HP), lambda r, c: (*bidx(r, c), 0)),    # dx
        pl.BlockSpec((1, T, NG, N), lambda r, c: (*bidx(r, c), 0, 0)),
        pl.BlockSpec((1, T, NG, N), lambda r, c: (*bidx(r, c), 0, 0)),
        pl.BlockSpec((1, T, H), lambda r, c: (*bidx(r, c), 0)),     # ddt
        pl.BlockSpec((1, T, H), lambda r, c: (*bidx(r, c), 0)),     # dm
    ]
    out_shape = [
        jax.ShapeDtypeStruct((R, L, HP), jnp.float32),
        jax.ShapeDtypeStruct((R, L, NG, N), jnp.float32),
        jax.ShapeDtypeStruct((R, L, NG, N), jnp.float32),
        jax.ShapeDtypeStruct((R, L, H), jnp.float32),
        jax.ShapeDtypeStruct((R, L, H), jnp.float32),
    ]
    if pre_silu:
        # gx (per-position Σ_P g·silu(acc), for dD) and dtp (for dA)
        out_specs += [
            pl.BlockSpec((1, T, H), lambda r, c: (*bidx(r, c), 0)),
            pl.BlockSpec((1, T, H), lambda r, c: (*bidx(r, c), 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((R, L, H), jnp.float32),
            jax.ShapeDtypeStruct((R, L, H), jnp.float32),
        ]
    outs = pl.pallas_call(
        kern,
        grid=(R, nc),
        in_specs=[
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # dt_bias
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # A
            pl.BlockSpec((1, H), lambda r, c: (0, 0)),          # D
            pl.BlockSpec((1, T, HP), lambda r, c: (*bidx(r, c), 0)),    # x
            pl.BlockSpec((1, T, H), lambda r, c: (*bidx(r, c), 0)),     # dt
            pl.BlockSpec((1, T, NG, N), lambda r, c: (*bidx(r, c), 0, 0)),
            pl.BlockSpec((1, T, NG, N), lambda r, c: (*bidx(r, c), 0, 0)),
            pl.BlockSpec((1, T, HP), lambda r, c: (*bidx(r, c), 0)),    # g
            pl.BlockSpec((1, 1, N, HP), lambda r, c: (*bidx(r, c), 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, HP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # pre_silu keeps per-head accumulators live across the unrolled
            # head body; at d_inner 2048 that puts the Mosaic stack just
            # past the default 16M scoped-VMEM budget — raise the ceiling
            # for this kernel (v5e VMEM is 128M; block/scratch DMAs here
            # total < 8M, so 40M leaves full double-buffering headroom).
            vmem_limit_bytes=40 * 1024 * 1024 if pre_silu else None),
    )(dt_bias.reshape(1, H).astype(jnp.float32),
      A.reshape(1, H).astype(jnp.float32),
      Dskip.reshape(1, H).astype(jnp.float32), x, dt, Bm, Cm, g, fentry)
    return outs


def supported(x_shape, B_shape, chunk: int) -> bool:
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
