"""Pallas flash attention with in-kernel ALiBi / local-window / causal bias.

TPU-native equivalent of the reference's vendored 1,112-line Triton
FlashAttention (SURVEY.md §2.3 B5:
pretrain/llmlib/architectures/modules/attention/flash_attn_triton.py — the
attention-bias-capable kernel behind MosaicBERT's ALiBi path) and of the
xformers LocalAttention backend (B6). Differences by design:

* The bias is never materialised: ALiBi is ``-slope * |i - j|`` and the
  local window a banded mask — both are recomputed from block indices
  inside the kernel (the Triton kernel streams a [H, L, L] bias tensor from
  HBM; at 8k context that tensor alone is 2 GB/head-group of traffic).
* Online-softmax forward with fp32 running max/sum in VMEM scratch; the
  [L, L] score matrix never exists. Residual = per-row logsumexp.
* Flash backward as two Pallas kernels over opposite grid orders (dq over
  k-blocks, dkv over q-blocks) recomputing p from the saved logsumexp —
  O(L) memory end to end.

Head dim is zero-padded to the 128-lane tile inside the wrapper (padding is
exact: padded q/k lanes contribute 0 to scores, padded v lanes produce
sliced-off zeros, and their gradients are zero).

Used by ``ops.attention.multi_head_attention`` on TPU for the baseline
(BERT-family) models; the SSM path has its own kernels (ops/pallas_scan).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BQ = 128
DEF_BK = 128
_NEG = -1e30


def _block_bias(iq, ik, blq, blk, nheads, slopes_ref, *, use_slopes, causal,
                window, symmetric):
    """[blq, blk] additive bias/mask for query block iq, key block ik.
    slopes_ref: [1, nheads] in SMEM, indexed by this program's head."""
    rows = iq * blq + jax.lax.broadcasted_iota(jnp.int32, (blq, blk), 0)
    cols = ik * blk + jax.lax.broadcasted_iota(jnp.int32, (blq, blk), 1)
    delta = rows - cols
    bias = jnp.zeros((blq, blk), jnp.float32)
    if use_slopes:
        h = jax.lax.rem(pl.program_id(0), nheads)
        slope = slopes_ref[0, h]
        dist = jnp.abs(delta) if symmetric else delta
        bias = bias - slope * dist.astype(jnp.float32)
    if window is not None:
        bias = jnp.where(jnp.abs(delta) <= window, bias, _NEG)
    if causal:
        bias = jnp.where(delta >= 0, bias, _NEG)
    return bias


def _fwd_kernel(slopes_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, nheads, use_slopes,
                causal, window, symmetric, nk):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)                        # [blq, hd]
    k = k_ref[0].astype(jnp.float32)                        # [blk, hd]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _block_bias(pl.program_id(1), ik, q.shape[0], k.shape[0],
                        nheads, slopes_ref, use_slopes=use_slopes,
                        causal=causal, window=window,
                        symmetric=symmetric)

    m_prev = m_scr[:, :1]                                   # [blq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                                  # [blq, blk]
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _():
        l = l_scr[:, :1]
        lsafe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[...] / lsafe).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[...] + jnp.log(lsafe)).astype(jnp.float32)


def _dq_kernel(slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
               dq_ref, dq_scr, *, scale, nheads, use_slopes, causal,
               window, symmetric, nk):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _block_bias(pl.program_id(1), ik, q.shape[0], k.shape[0],
                        nheads, slopes_ref, use_slopes=use_slopes,
                        causal=causal, window=window,
                        symmetric=symmetric)
    p = jnp.exp(s - lse_ref[0][:, :1])                      # [blq, blk]
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dlt_ref[0][:, :1])                       # [blq, blk]
    dq_scr[...] += scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale, nheads,
                use_slopes, causal, window, symmetric, nq):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _block_bias(iq, pl.program_id(1), q.shape[0], k.shape[0],
                        nheads, slopes_ref, use_slopes=use_slopes,
                        causal=causal, window=window,
                        symmetric=symmetric)
    p = jnp.exp(s - lse_ref[0][:, :1])                      # [blq, blk]
    do = do_ref[0].astype(jnp.float32)
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [blk, hd]
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dlt_ref[0][:, :1])
    dk_scr[...] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [blk, hd]

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _pad_heads(x, hd_pad):
    hd = x.shape[-1]
    if hd == hd_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, hd_pad - hd)])


def _common(q, blq, blk):
    BH, L, hd = q.shape
    blq, blk = min(blq, L), min(blk, L)
    if L % blq or L % blk:
        raise ValueError(f"L={L} not tileable by blq={blq}/blk={blk}")
    hd_pad = max(128, ((hd + 127) // 128) * 128)
    return BH, L, hd, blq, blk, hd_pad, L // blq, L // blk


def _fwd(q, k, v, slopes, scale, nheads, use_slopes, causal, window,
         symmetric, blq, blk):
    BH, L, hd, blq, blk, hd_pad, nq, nk = _common(q, blq, blk)
    qp, kp, vp = (_pad_heads(t, hd_pad) for t in (q, k, v))
    kern = functools.partial(
        _fwd_kernel, scale=scale, nheads=nheads, use_slopes=use_slopes,
        causal=causal, window=window, symmetric=symmetric, nk=nk)
    qmap = lambda b, i, j: (b, i, 0)
    kmap = lambda b, i, j: (b, j, 0)
    o, lse = pl.pallas_call(
        kern,
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blq, hd_pad), qmap),
            pl.BlockSpec((1, blk, hd_pad), kmap),
            pl.BlockSpec((1, blk, hd_pad), kmap),
        ],
        out_specs=[
            pl.BlockSpec((1, blq, hd_pad), qmap),
            pl.BlockSpec((1, blq, 128), qmap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((BH, L, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blq, 128), jnp.float32),
            pltpu.VMEM((blq, 128), jnp.float32),
            pltpu.VMEM((blq, hd_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(slopes, qp, kp, vp)
    return o[..., :hd], lse


def _bwd(q, k, v, slopes, lse, o, do, scale, nheads, use_slopes, causal,
         window, symmetric, blq, blk):
    BH, L, hd, blq, blk, hd_pad, nq, nk = _common(q, blq, blk)
    qp, kp, vp, op, dop = (_pad_heads(t, hd_pad) for t in (q, k, v, o, do))
    # delta[i] = sum_d do[i,d] * o[i,d], broadcast to the 128-lane residual
    # layout the kernels index as [:, :1].
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (BH, L, 128))

    qmap = lambda b, i, j: (b, i, 0)
    kmap = lambda b, i, j: (b, j, 0)
    smap = lambda b, i, j: (0, 0)
    common_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, blq, hd_pad), qmap),
        pl.BlockSpec((1, blk, hd_pad), kmap),
        pl.BlockSpec((1, blk, hd_pad), kmap),
        pl.BlockSpec((1, blq, hd_pad), qmap),
        pl.BlockSpec((1, blq, 128), qmap),
        pl.BlockSpec((1, blq, 128), qmap),
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nheads=nheads,
                          use_slopes=use_slopes, causal=causal,
                          window=window, symmetric=symmetric, nk=nk),
        grid=(BH, nq, nk),
        in_specs=common_specs,
        out_specs=pl.BlockSpec((1, blq, hd_pad), qmap),
        out_shape=jax.ShapeDtypeStruct((BH, L, hd_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((blq, hd_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(slopes, qp, kp, vp, dop, lse, delta)

    # dkv: swap the roles — grid minor axis walks q-blocks.
    qmap2 = lambda b, j, i: (b, i, 0)
    kmap2 = lambda b, j, i: (b, j, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, nheads=nheads,
                          use_slopes=use_slopes, causal=causal,
                          window=window, symmetric=symmetric, nq=nq),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blq, hd_pad), qmap2),
            pl.BlockSpec((1, blk, hd_pad), kmap2),
            pl.BlockSpec((1, blk, hd_pad), kmap2),
            pl.BlockSpec((1, blq, hd_pad), qmap2),
            pl.BlockSpec((1, blq, 128), qmap2),
            pl.BlockSpec((1, blq, 128), qmap2),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, hd_pad), kmap2),
            pl.BlockSpec((1, blk, hd_pad), kmap2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L, hd_pad), k.dtype),
            jax.ShapeDtypeStruct((BH, L, hd_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, hd_pad), jnp.float32),
            pltpu.VMEM((blk, hd_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(slopes, qp, kp, vp, dop, lse, delta)
    return dq[..., :hd], dk[..., :hd], dv[..., :hd]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _flash(q, k, v, slopes, scale, nheads, use_slopes, causal, window,
           symmetric, blq, blk):
    return _fwd(q, k, v, slopes, scale, nheads, use_slopes, causal,
                window, symmetric, blq, blk)[0]


def _flash_fwd(q, k, v, slopes, scale, nheads, use_slopes, causal, window,
               symmetric, blq, blk):
    o, lse = _fwd(q, k, v, slopes, scale, nheads, use_slopes, causal,
                  window, symmetric, blq, blk)
    return o, (q, k, v, slopes, lse, o)


def _flash_bwd(scale, nheads, use_slopes, causal, window, symmetric, blq,
               blk, saved, do):
    q, k, v, slopes, lse, o = saved
    dq, dk, dv = _bwd(q, k, v, slopes, lse, o, do, scale, nheads,
                      use_slopes, causal, window, symmetric, blq, blk)
    return dq, dk, dv, jnp.zeros_like(slopes)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    alibi_slopes: Optional[jax.Array] = None,
    causal: bool = False,
    local_window: Optional[int] = None,
    alibi_symmetric: bool = True,
    sm_scale: Optional[float] = None,
    blq: int = DEF_BQ,
    blk: int = DEF_BK,
) -> jax.Array:
    """q, k, v: [B, L, H, hd] -> [B, L, H, hd].

    ``alibi_slopes``: [H] per-head slopes; bias = -slope * |i - j|
    (MosaicBERT's symmetric encoder form; ``alibi_symmetric=False`` gives
    the causal (i - j) form). ``local_window``: keep |i - j| <= window.
    Differentiable in q/k/v (flash backward, slopes are constants).
    """
    B, L, H, hd = q.shape
    scale = 1.0 / math.sqrt(hd) if sm_scale is None else sm_scale
    fold = lambda t: t.transpose(0, 2, 1, 3).reshape(B * H, L, hd)
    slopes = (jnp.zeros((1, H), jnp.float32) if alibi_slopes is None
              else alibi_slopes.reshape(1, H).astype(jnp.float32))
    o = _flash(fold(q), fold(k), fold(v), slopes, scale, H,
               alibi_slopes is not None, causal, local_window,
               alibi_symmetric, blq, blk)
    return o.reshape(B, H, L, hd).transpose(0, 2, 1, 3)
