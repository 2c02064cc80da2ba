"""Fused Mamba-mixer kernel: conv + x_proj + dt_proj + selective scan.

One pallas_call per direction runs the whole mixer interior, eliminating the
HBM round-trips of the decomposed path (conv output, dt/B/C projections and
scan input each materialised ~[rows, L, d_inner] tensors — ~2 GB/layer at
l20 batch 128):

  phase 0 (per d-block): causal/anticausal depthwise conv + SiLU on the
      incoming x-projection, conv halo carried across L-chunks in scratch;
      the conv output parks in a VMEM scratch and its contribution to the
      x_proj outputs accumulates: dbc += xg_d @ [W_dt | W_B | W_C]_d  (MXU).
  phase 1 (per d-block): dt = dbc_dt @ W_dtproj (MXU) + softplus + exp
      discretisation, then the sequential selective scan with the fp32
      carry, C-contraction and D-skip — identical math to
      ops.pallas_scan's forward.

Grid is (rows, L-chunks + 1, d-blocks), SOFTWARE-PIPELINED across phases:
step s runs phase 0 of chunk s and phase 1 of chunk s-1 in one kernel body
(double-buffered scratch), so the VLIW scheduler can overlap the MXU
conv/projection work with the serial VPU scan of the previous chunk. Edge
steps clamp their index maps to "park" on a block whose next writer runs
before any write-back.

Not used under tensor parallelism (the x_proj contraction would need a
cross-shard psum mid-kernel); the decomposed path remains for that.
Differentiable: under grad the forward emits residuals and
``bimamba_mixer_fused``'s VJP chains the Pallas scan backward with the
x_proj / conv transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BL = 512
DEF_BD = 256
# Scoped-VMEM fit boundary for the auto tile picker: the xg scratch is
# 8*bl*D bytes and the loop temporaries scale with bl*bd, so with bd=D the
# kernel fits iff bl*D stays at or below this (measured on v5e: 512*768 and
# 256*1536 = 393216 compile, 256*2048 = 524288 OOMs the 16MB limit).
_VMEM_FIT_ELEMS = 393216


def _mixer_kernel(convw_ref, convb_ref, wdtlr_ref, wB_ref, wC_ref,
                  wdt_ref, dtb_ref, A_ref, Dsk_ref, xi_ref,
                  *refs, reverse: bool, K: int, Rk: int, N: int,
                  emit_res: bool, fuse_in: bool = False,
                  readout_vpu: bool = False):
    rest = list(refs)
    # With fuse_in the xi_ref block holds pre-projection x rows [bl, Dm]
    # and win_ref the [Dm, bd] in_proj slice: the projection runs on the
    # (otherwise idle during the scan) MXU inside the pipeline, and the
    # [B, L, D] xi tensor never exists in HBM.
    win_ref = rest.pop(0) if fuse_in else None
    y_ref = rest.pop(0)
    if emit_res:
        # residual outputs for the training backward (see
        # bimamba_mixer_fused): pre-SiLU conv output, the f32 x_proj
        # results, and the scan's chunk-entry states
        acc_ref, dtlr_ref, Bout_ref, Cout_ref, hb_ref = rest[:5]
        rest = rest[5:]
    xg_scr, dtlr_scr, B_scr, C_scr, halo_scr, h_scr = rest
    # Software pipelining: grid step s does the MXU-heavy conv+projection
    # work of chunk s AND the VPU-bound scan of chunk s-1 in ONE kernel
    # body, so the VLIW scheduler can overlap them (the scan's serial
    # h-dependency leaves the MXU mostly idle otherwise). Double-buffered
    # (parity-indexed) xg/dt_lr/B/C scratch decouples the two chunks.
    s = pl.program_id(1)
    di = pl.program_id(2)
    nl = pl.num_programs(1) - 1
    par0 = jax.lax.rem(s, 2)
    par1 = jax.lax.rem(s + 1, 2)  # == (s-1) % 2 for s > 0

    @pl.when(s == 0)
    def _():
        h_scr[di] = jnp.zeros_like(h_scr[di])
        halo_scr[di] = jnp.zeros_like(halo_scr[di])

    @pl.when((s < nl) & (di == 0))
    def _():
        dtlr_scr[par0] = jnp.zeros_like(dtlr_scr[par0])
        B_scr[par0] = jnp.zeros_like(B_scr[par0])
        C_scr[par0] = jnp.zeros_like(C_scr[par0])

    @pl.when(s < nl)
    def _conv_and_project():  # phase-0 work for processing chunk s
        if fuse_in:
            xi = jax.lax.dot_general(                       # [bl, bd] on MXU
                xi_ref[0], win_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            xi = xi_ref[0].astype(jnp.float32)              # [bl, bd]
        bl, bd = xi.shape
        w = convw_ref[0].astype(jnp.float32)                # [8, bd] row taps
        b = convb_ref[0, 0].astype(jnp.float32)             # [bd]
        # halo rows are stored 8-sublane aligned (unaligned dynamic-index
        # stores lower to unsupported gathers); only K-1 rows are live.
        halo8 = halo_scr[di]                                # [8, bd]
        if reverse:
            # anticausal: y[t] = sum_j w[K-1-j] x[t+j]; chunks arrive
            # right-to-left so the halo holds the next chunk's first rows.
            ext = jnp.concatenate([xi, halo8[: K - 1]], axis=0)
            acc = b[None, :]
            for j in range(K):
                acc = acc + ext[j : j + bl] * w[K - 1 - j][None, :]
            halo_scr[di] = xi[:8]
        else:
            ext = jnp.concatenate([halo8[8 - (K - 1):], xi], axis=0)
            acc = b[None, :]
            for k in range(K):
                acc = acc + ext[k : k + bl] * w[k][None, :]
            halo_scr[di] = xi[bl - 8:]
        if emit_res:
            acc_ref[0] = acc.astype(acc_ref.dtype)          # pre-SiLU
        xg = jax.nn.silu(acc)                               # [bl, bd]
        xg_scr[par0, di] = xg
        dot = lambda w: jax.lax.dot_general(
            xg, w.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtlr_scr[par0] += dot(wdtlr_ref[0])
        B_scr[par0] += dot(wB_ref[0])
        C_scr[par0] += dot(wC_ref[0])

    @pl.when(s > 0)
    def _scan():  # phase-1 work for processing chunk s-1
        if emit_res:
            hb_ref[0, 0] = h_scr[di].T                      # chunk entry
            dtlr_ref[0] = dtlr_scr[par1]
            Bout_ref[0] = B_scr[par1]
            Cout_ref[0] = C_scr[par1]
        xg = xg_scr[par1, di]                               # [bl, bd]
        bl, bd = xg.shape
        dt_lr = dtlr_scr[par1]
        Bm = B_scr[par1]                                    # [bl, N]
        Cm = C_scr[par1]
        wdt = wdt_ref[0].astype(jnp.float32)                # [Rk, bd]
        dtb = dtb_ref[0, 0].astype(jnp.float32)
        At = A_ref[0].astype(jnp.float32).T                 # [N, bd]
        dsk = Dsk_ref[0, 0].astype(jnp.float32)

        dt = jax.lax.dot_general(
            dt_lr, wdt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtp = jax.nn.softplus(dt + dtb[None, :])
        dtl = dtp * 1.4426950408889634                      # [bl, bd]
        dtx = dtp * xg

        h0 = h_scr[di]
        steps = range(bl)
        if reverse:
            steps = reversed(list(steps))
        ys = []
        for t in steps:
            # decay/input terms form per step as VPU broadcasts, so the
            # whole-chunk [bl, N, bd] a/b tensors never round-trip VMEM
            # (+5%, tools/exp_inloop.py; forming them per-step as MXU outer
            # products instead was measured 6x SLOWER)
            at = jnp.exp2(dtl[t][None, :] * At)             # [N, bd]
            h0 = Bm[t][:, None] * dtx[t][None, :] + at * h0
            if readout_vpu:
                # C-readout as a VPU multiply + sublane-tree reduce —
                # opt-in experiment. Hypothesis was that at large bd the
                # MXU form below is issue-bound (bd/128 systolic passes
                # per timestep); measured on v5e it is the opposite: this
                # variant is ~60% slower at D=2048 (cross-sublane reduces
                # cost more VPU time than the MXU issues they remove), so
                # "auto" never picks it. Kept for hardware with different
                # MXU-issue/VPU-shuffle balance. Also needs bl <= 64 at
                # bd >= 2048: the unrolled [N, bd] mul temporaries are
                # stack-allocated and overflow scoped VMEM at bl = 128.
                ys.append(jnp.sum(Cm[t][:, None] * h0, axis=0,
                                  keepdims=True))           # [1, bd]
            else:
                # C-readout as a (1,N)x(N,bd) dot — on the otherwise-idle
                # MXU rather than the VPU the recurrence saturates; each
                # step's state dies in registers instead of materialising
                # [bl, N, bd]. Best at small bd (few passes per issue).
                ys.append(jax.lax.dot_general(
                    Cm[t : t + 1], h0, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))    # [1, bd]
        h_scr[di] = h0
        if reverse:
            ys = ys[::-1]
        y = jnp.concatenate(ys, axis=0) + xg * dsk[None, :]
        y_ref[0] = y.astype(y_ref.dtype)


def mixer_scan_fused(
    xi: jax.Array,       # [B, L, D] pre-conv x-projection (one direction)
    conv_w: jax.Array,   # [D, K]
    conv_b: jax.Array,   # [D]
    w_dtlr: jax.Array,   # [D, Rk]
    w_B: jax.Array,      # [D, N]
    w_C: jax.Array,      # [D, N]
    dt_proj_w: jax.Array,  # [Rk, D]
    dt_bias: jax.Array,  # [D]
    A: jax.Array,        # [D, N]
    Dskip: jax.Array,    # [D]
    reverse: bool = False,
    bl: int | None = None,
    bd: int | None = None,
    emit_residuals: bool = False,
    w_in: jax.Array | None = None,  # [Dm, D]: fuse in_proj; xi is then x
    readout: str = "auto",          # C-readout engine: auto | mxu | vpu
):
    """Fused mixer interior for one scan direction. With
    ``emit_residuals`` also returns (acc, dt_lr, B, C, hb) — the pre-SiLU
    conv output, f32 x_proj results (all natural time order) and the scan's
    chunk-entry states (processing order, [B, L/bl, D, N]) — everything the
    training backward needs without re-running conv/x_proj.

    With ``w_in`` the in_proj x-projection ALSO fuses into the kernel:
    ``xi`` is the block input ``x [B, L, d_model]`` and each grid step
    projects its chunk on the MXU (which otherwise idles while the VPU
    scans chunk s-1), so the [B, L, d_inner] activation never round-trips
    HBM. Inference-path only (incompatible with emit_residuals)."""
    fuse_in = w_in is not None
    if fuse_in and emit_residuals:
        raise ValueError("w_in fusion is inference-path only")
    B, L, Dm = xi.shape
    D = w_B.shape[0]
    N = w_B.shape[-1]
    Rk = w_dtlr.shape[-1]
    K = conv_w.shape[-1]
    if bd is None:
        # Whole channel dim as one lane tile (nd=1): measured 10-18% faster
        # than bd=256 at every preset d_inner (768..2048) on v5e — the scan
        # of chunk s-1 never revisits d-tiles, so carry/halo scratch stays
        # single-buffered and the conv/scan pipeline has no parked steps.
        # The residual-emitting (training) variant keeps DEF_BD: its extra
        # per-tile outputs (acc/hb/dt_lr/B/C) don't fit at bd=D.
        bd = D if not emit_residuals else min(DEF_BD, D)
    if bl is None:
        # Largest time chunk whose scratch fits scoped VMEM (xg is
        # 8*bl*D bytes, temporaries scale with bl*bd). Chunks come from
        # the divisor picker so any L that is a multiple of 8 tiles
        # (e.g. the PlantCAD2 LoRA recipe's 600-bp windows).
        from plantcaduceus_tpu.ops.pallas_scan import pick_bl

        bl = pick_bl(L, min(DEF_BL, L))
        while bl > 128 and bl * D > _VMEM_FIT_ELEMS:
            nxt = pick_bl(L, bl - 8)
            if nxt == bl:
                break
            bl = nxt
    bl = min(bl, L)
    bd = min(bd, D)
    if L % bl or D % bd:
        raise ValueError(f"shape not tileable: L={L} bl={bl} D={D} bd={bd}")
    if readout not in ("auto", "mxu", "vpu"):
        raise ValueError(f"unknown readout {readout!r}: expected one of "
                         "'auto', 'mxu', 'vpu'")
    if readout == "vpu" and bd >= 2048 and bl > 64:
        # The unrolled [N, bd] mul temporaries of the VPU readout are
        # stack-allocated and overflow scoped VMEM at bl=128 when bd>=2048
        # (see _mixer_kernel readout_vpu comment).
        raise ValueError(
            f"readout='vpu' needs bl <= 64 at bd >= 2048 (got bl={bl}, "
            f"bd={bd}): the per-step [N, bd] temporaries overflow scoped "
            "VMEM; pass bl=64 explicitly or use readout='mxu'")
    nl, nd = L // bl, D // bd

    # conv taps as 8-sublane-aligned rows (lane-dim tap selection lowers
    # to an unsupported gather)
    conv_w_rows = jnp.zeros((8, D), jnp.float32).at[:K].set(
        conv_w.T.astype(jnp.float32))

    def lmap(l):
        return (nl - 1 - l) if reverse else l

    # Pipelined grid (B, nl+1, nd): step s = conv/projection of chunk s +
    # scan of chunk s-1. Index maps clamp at the two edge steps (s == 0 has
    # no scan, s == nl no conv) by parking on a block whose next write
    # happens before any write-back (block index unchanged in between).
    def ximap(b, s, d):
        return (b, lmap(jnp.minimum(s, nl - 1)),
                jnp.where(s < nl, d, nd - 1))

    def ymap(b, s, d):
        return (b, lmap(jnp.maximum(s - 1, 0)), jnp.where(s > 0, d, 0))

    dmap3 = lambda b, s, d: (0, 0, d)

    out_specs = [pl.BlockSpec((1, bl, bd), ymap)]
    out_shape = [jax.ShapeDtypeStruct((B, L, D), xi.dtype)]
    if emit_residuals:
        # acc writes with the conv (chunk s); hb/dt_lr/B/C write with the
        # scan (chunk s-1, hb in processing order).
        accmap = ximap
        hbmap = lambda b, s, d: (b, jnp.maximum(s - 1, 0),
                                 jnp.where(s > 0, d, 0), 0)
        lowmap = lambda b, s, d: (b, lmap(jnp.maximum(s - 1, 0)), 0)
        out_specs += [
            pl.BlockSpec((1, bl, bd), accmap),                     # acc
            pl.BlockSpec((1, bl, Rk), lowmap),                     # dt_lr
            pl.BlockSpec((1, bl, N), lowmap),                      # B
            pl.BlockSpec((1, bl, N), lowmap),                      # C
            pl.BlockSpec((1, 1, bd, N), hbmap),                    # hb
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, L, D), xi.dtype),
            jax.ShapeDtypeStruct((B, L, Rk), jnp.float32),
            jax.ShapeDtypeStruct((B, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, nl, D, N), jnp.float32),
        ]

    if readout == "auto":
        # Measured on v5e (D=2048, B=128, L=512): the VPU mul+sublane-tree
        # readout is ~60% SLOWER than the per-step MXU dot (9.2 vs 5.7 ms)
        # — cross-sublane reduces are expensive enough that the MXU form
        # wins even when a (1,N)x(N,bd) dot is bd/128 systolic passes per
        # timestep. The vpu variant stays as an opt-in experiment for
        # hardware where the balance differs.
        readout = "mxu"
    kernel = functools.partial(_mixer_kernel, reverse=reverse, K=K, Rk=Rk,
                               N=N, emit_res=emit_residuals, fuse_in=fuse_in,
                               readout_vpu=readout == "vpu")
    in_specs = [
        pl.BlockSpec((1, 8, bd), lambda b, s, d: (0, 0, d)),   # conv_w
        pl.BlockSpec((1, 1, bd), dmap3),                       # conv_b
        pl.BlockSpec((1, bd, Rk), lambda b, s, d: (0, d, 0)),  # w_dtlr
        pl.BlockSpec((1, bd, N), lambda b, s, d: (0, d, 0)),   # w_B
        pl.BlockSpec((1, bd, N), lambda b, s, d: (0, d, 0)),   # w_C
        pl.BlockSpec((1, Rk, bd), lambda b, s, d: (0, 0, d)),  # dt_proj
        pl.BlockSpec((1, 1, bd), dmap3),                       # dt_bias
        pl.BlockSpec((1, bd, N), lambda b, s, d: (0, d, 0)),   # A
        pl.BlockSpec((1, 1, bd), dmap3),                       # Dskip
    ]
    if fuse_in:
        # x rows for chunk s (whole d_model) + the in_proj slice for this
        # d-tile (constant index: resident in VMEM across the whole grid).
        in_specs += [
            pl.BlockSpec((1, bl, Dm),
                         lambda b, s, d: (b, lmap(jnp.minimum(s, nl - 1)), 0)),
            pl.BlockSpec((1, Dm, bd), lambda b, s, d: (0, 0, d)),  # w_in
        ]
    else:
        in_specs += [pl.BlockSpec((1, bl, bd), ximap)]             # xi
    res = pl.pallas_call(
        kernel,
        grid=(B, nl + 1, nd),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nd, bl, bd), jnp.float32),    # xg (parity-buffered)
            pltpu.VMEM((2, bl, Rk), jnp.float32),        # dt_lr accumulator
            pltpu.VMEM((2, bl, N), jnp.float32),         # B accumulator
            pltpu.VMEM((2, bl, N), jnp.float32),         # C accumulator
            pltpu.VMEM((nd, 8, bd), jnp.float32),        # conv halo (8-row aligned)
            pltpu.VMEM((nd, N, bd), jnp.float32),        # scan carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
        ),
    )(conv_w_rows[None], conv_b[None, None], w_dtlr[None], w_B[None],
      w_C[None], dt_proj_w[None], dt_bias[None, None], A[None],
      Dskip[None, None], xi,
      *((w_in[None],) if fuse_in else ()))
    return res if emit_residuals else res[0]


# ---------------------------------------------------------------------------
# Differentiable fused mixer with in-kernel in_proj (inference hot path)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def bimamba_mixer_fused_x(x, z, w_in, conv_w, conv_b, w_dtlr, w_B, w_C,
                          dt_proj_w, dt_bias, A, Dskip):
    """bimamba_mixer_fused with the (tied) in_proj x-projection fused into
    each direction's kernel: takes ``x [B, L, d_model]`` and ``w_in
    [d_model, d_inner]`` instead of the projected ``xi``, so the
    [B, L, d_inner] activation never materialises in HBM and the
    projection's MXU work hides under the other chunk's VPU scan
    (measured: the l32 batch-128 forward drops ~11%). Under
    differentiation it falls back to einsum + the residual-emitting
    kernel with the in_proj adjoint chained on (training numerics and
    memory behavior identical to the decomposed formulation)."""
    # Cast the in_proj slice to the activation dtype: the in-kernel dot
    # multiplies in that dtype with an f32 accumulator, matching the
    # decomposed einsum's MXU numerics (an f32 weight block would also
    # double the resident VMEM at large d_inner).
    w_in = w_in.astype(x.dtype)
    ys = [
        mixer_scan_fused(x, conv_w[g], conv_b[g], w_dtlr[g], w_B[g],
                         w_C[g], dt_proj_w[g], dt_bias[g], A[g], Dskip[g],
                         reverse=(g == 1), w_in=w_in)
        for g in range(2)
    ]
    return ((ys[0] + ys[1]).astype(jnp.float32)
            * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)


def _bimamba_mixer_x_fwd(x, z, w_in, conv_w, conv_b, w_dtlr, w_B, w_C,
                         dt_proj_w, dt_bias, A, Dskip):
    xi = jax.lax.dot_general(x, w_in.astype(x.dtype),
                             (((2,), (0,)), ((), ())))
    out, saved = _bimamba_mixer_fwd(xi, z, conv_w, conv_b, w_dtlr, w_B,
                                    w_C, dt_proj_w, dt_bias, A, Dskip)
    return out, (x, w_in, saved)


def _bimamba_mixer_x_bwd(res, gy):
    x, w_in, saved = res
    grads = _bimamba_mixer_bwd(saved, gy)
    dxi = grads[0].astype(jnp.float32)
    dx = jnp.einsum("bli,di->bld", dxi,
                    w_in.astype(jnp.float32)).astype(x.dtype)
    dw_in = jnp.einsum("bld,bli->di", x.astype(jnp.float32),
                       dxi).astype(w_in.dtype)
    return (dx, grads[1], dw_in) + grads[2:]


bimamba_mixer_fused_x.defvjp(_bimamba_mixer_x_fwd, _bimamba_mixer_x_bwd)


# ---------------------------------------------------------------------------
# Differentiable fused mixer (training path)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def bimamba_mixer_fused(xi, z, conv_w, conv_b, w_dtlr, w_B, w_C,
                        dt_proj_w, dt_bias, A, Dskip):
    """Whole bidirectional mixer interior with tied in_proj and ``add``
    combination: ``(scan_fwd(xi) + scan_rev(xi)) * silu(z)``. Per-direction
    params are stacked on axis 0 ([2, ...]); ``A`` is the negative decay
    matrix. Inference runs the plain fused kernel; under differentiation the
    forward emits residuals so the backward never re-runs conv/x_proj — the
    roadmap's "fused mixer under training" (the decomposed path rebuilt
    those [B, L, d_inner] tensors both in the forward and in the remat
    recompute)."""
    ys = [
        mixer_scan_fused(xi, conv_w[g], conv_b[g], w_dtlr[g], w_B[g],
                         w_C[g], dt_proj_w[g], dt_bias[g], A[g], Dskip[g],
                         reverse=(g == 1))
        for g in range(2)
    ]
    return ((ys[0] + ys[1]).astype(jnp.float32)
            * jax.nn.silu(z.astype(jnp.float32))).astype(xi.dtype)


def _bimamba_mixer_fwd(xi, z, conv_w, conv_b, w_dtlr, w_B, w_C,
                       dt_proj_w, dt_bias, A, Dskip):
    from plantcaduceus_tpu.ops.pallas_scan import train_bl

    # divisor chunk so non-power-of-two lengths (e.g. 600-bp LoRA windows)
    # train; the bwd group resolves the same bl from the same inputs, so
    # the emitted hb chunking always matches. Width-aware: wide lanes
    # (d_inner >= 3072, pc2-large) shrink bl to fit scoped VMEM. w_B is
    # group-stacked here ([G, d_inner, N]) — the bwd resolves the same
    # chunk from xg.shape ([B, L, d_inner]).
    bl = train_bl(xi.shape[1], w_B.shape[1])
    res = [
        mixer_scan_fused(xi, conv_w[g], conv_b[g], w_dtlr[g], w_B[g],
                         w_C[g], dt_proj_w[g], dt_bias[g], A[g], Dskip[g],
                         reverse=(g == 1), bl=bl, emit_residuals=True)
        for g in range(2)
    ]
    y_sum = (res[0][0] + res[1][0]).astype(jnp.float32)
    out = (y_sum * jax.nn.silu(z.astype(jnp.float32))).astype(xi.dtype)
    saved = (xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, dt_proj_w, dt_bias,
             A, Dskip, y_sum, tuple(r[1:] for r in res))
    return out, saved


def _bimamba_mixer_bwd(saved, gy):
    from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
    from plantcaduceus_tpu.ops.pallas_scan import (DEF_BD, train_bl,
                                                   _pallas_bwd_group)

    (xi, z, conv_w, conv_b, w_dtlr, w_B, w_C, dt_proj_w, dt_bias, A, Dskip,
     y_sum, res) = saved
    f32 = jnp.float32
    gy = gy.astype(f32)
    zf = z.astype(f32)
    sig = jax.lax.logistic(zf)
    silu = zf * sig
    dz = (gy * y_sum * (sig + silu * (1 - sig))).astype(z.dtype)
    gy_scan = (gy * silu).astype(xi.dtype)

    dxi = jnp.zeros(xi.shape, f32)
    pw = []  # per-direction param grads
    for g in range(2):
        acc, dt_lr, Bm, Cm, hb = res[g]
        accf = acc.astype(f32)
        sig_a = jax.lax.logistic(accf)
        xg = (accf * sig_a).astype(xi.dtype)                 # silu(acc)
        out = _pallas_bwd_group(
            xg[None], dt_lr[None], A[g : g + 1],
            Bm[None], Cm[None], Dskip[g : g + 1],
            dt_bias[g : g + 1], dt_proj_w[g : g + 1].astype(f32),
            gy_scan[None], hb, train_bl(xg.shape[1], xg.shape[2]),
            DEF_BD, True, reverse=g == 1)
        dxg, ddtlr, dA_g, dB, dC, dD_g, ddtb_g, dWdt_g = out
        dxg, ddtlr, dB, dC = (t[0] for t in (dxg, ddtlr, dB, dC))

        # x_proj chain: dt_lr/B/C = xg @ w_*
        xgf = xg.astype(f32)
        dxg_full = (dxg
                    + jnp.einsum("blr,ir->bli", ddtlr, w_dtlr[g].astype(f32))
                    + jnp.einsum("bln,in->bli", dB, w_B[g].astype(f32))
                    + jnp.einsum("bln,in->bli", dC, w_C[g].astype(f32)))
        dw_dtlr = jnp.einsum("bli,blr->ir", xgf, ddtlr)
        dw_B = jnp.einsum("bli,bln->in", xgf, dB)
        dw_C = jnp.einsum("bli,bln->in", xgf, dC)

        # SiLU + depthwise-conv chain (conv is linear: vjp == transpose;
        # depthwise_conv_xla carries a hand-written transpose rule)
        dacc = dxg_full * (sig_a * (1 + accf * (1 - sig_a)))
        conv_fn = lambda x_, w_, b_: depthwise_conv_xla(
            x_, w_, b_, activation=None, anticausal=(g == 1))
        _, conv_vjp = jax.vjp(conv_fn, xi.astype(f32),
                              conv_w[g].astype(f32), conv_b[g].astype(f32))
        dxi_g, dcw_g, dcb_g = conv_vjp(dacc)
        dxi = dxi + dxi_g
        pw.append((dcw_g, dcb_g, dw_dtlr, dw_B, dw_C, dWdt_g[0],
                   ddtb_g[0], dA_g[0], dD_g[0]))

    stack = lambda i: jnp.stack([p[i] for p in pw])
    return (dxi.astype(xi.dtype), dz,
            stack(0).astype(conv_w.dtype), stack(1).astype(conv_b.dtype),
            stack(2).astype(w_dtlr.dtype), stack(3).astype(w_B.dtype),
            stack(4).astype(w_C.dtype), stack(5).astype(dt_proj_w.dtype),
            stack(6).astype(dt_bias.dtype), stack(7).astype(A.dtype),
            stack(8).astype(Dskip.dtype))


bimamba_mixer_fused.defvjp(_bimamba_mixer_fwd, _bimamba_mixer_bwd)
