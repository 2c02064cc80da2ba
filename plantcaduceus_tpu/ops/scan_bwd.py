"""Hand-written selective-scan backward with chunked recomputation.

The CUDA reference ships its own fused backward; JAX autodiff through the
associative-scan formulation materialises ~6 ``[*, L, D, N]`` tensors —
>10 GB for a realistic l20 training microbatch, an OOM on a 16 GB chip.
This backward instead recomputes states *chunk-locally* from the boundary
states the Pallas forward already emits, processing L in blocks via
``lax.scan`` so live memory is O(chunk · D · N):

  forward recurrence   h[t] = a[t] h[t-1] + b[t]
  adjoint recurrence   g[t] = C[t]⊗gy[t] + a[t+1] g[t+1]   (reverse scan)

  dx   = (Σ_n g·B) · dt'            + gy · D
  dB   = Σ_d g · dt'·x              dC = Σ_d gy · h
  ddt' = Σ_n g·h[t-1]·a·A + (Σ_n g·B) · x
  dA   = Σ_t g·h[t-1]·a·dt'         dD = Σ_t gy·x
  (softplus / dt-bias / low-rank dt projection chain rules applied on top)

Used as the custom-VJP backward of ops.pallas_scan; numerically validated
against autodiff of the sequential reference in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def _chunk_grads(x_c, dtp_c, A, Bm_c, Cm_c, gy_c, h_in, g_next):
    """Gradients for one time chunk. Shapes: x/dtp/gy [G,B,T,D];
    Bm/Cm [G,B,T,N]; A [G,D,N]; h_in/g_next [G,B,D,N].
    Returns per-chunk grads + (h_out, g_carry, dA_partial)."""
    f32 = jnp.float32
    a = jnp.exp(dtp_c[..., None] * A[:, None, None])          # [G,B,T,D,N]
    b = (dtp_c * x_c)[..., None] * Bm_c[:, :, :, None, :]

    # forward states within chunk, seeded by h_in
    a_cum, b_scan = jax.lax.associative_scan(_combine, (a, b), axis=2)
    h = b_scan + a_cum * h_in[:, :, None]
    h_prev = jnp.concatenate([h_in[:, :, None], h[:, :, :-1]], axis=2)

    # adjoint: g[t] = u[t] + a[t+1] g[t+1]; reverse first-order recurrence
    u = Cm_c[:, :, :, None, :] * gy_c[..., None]
    a_next = jnp.concatenate(
        [a[:, :, 1:], jnp.ones_like(a[:, :, :1])], axis=2)
    u = u.at[:, :, -1].add(g_next)
    ar = jnp.flip(a_next, axis=2)
    ur = jnp.flip(u, axis=2)
    _, g_rev = jax.lax.associative_scan(_combine, (ar, ur), axis=2)
    g = jnp.flip(g_rev, axis=2)                               # [G,B,T,D,N]

    da_scaled = g * h_prev * a                                # g·h[t-1]·a
    sum_gB = jnp.einsum("gbtdn,gbtn->gbtd", g, Bm_c)
    ddtp = jnp.einsum("gbtdn,gdn->gbtd", da_scaled, A) + sum_gB * x_c
    dx = sum_gB * dtp_c
    dB = jnp.einsum("gbtdn,gbtd->gbtn", g, dtp_c * x_c)
    dC = jnp.einsum("gbtd,gbtdn->gbtn", gy_c, h)
    dA_part = jnp.einsum("gbtdn,gbtd->gdn", da_scaled, dtp_c)

    g_carry = a[:, :, 0] * g[:, :, 0]                         # into chunk t-1
    return (dx, ddtp, dB, dC), h[:, :, -1], g_carry, dA_part


def selective_scan_grads(
    x: jax.Array,        # [G,B,L,D]
    dt_raw: jax.Array,   # [G,B,L,D] pre-softplus (post low-rank projection)
    A: jax.Array,        # [G,D,N]
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,    # [G,D]
    dt_bias: jax.Array,  # [G,D]
    gy: jax.Array,       # [G,B,L,D]
    hb: Optional[jax.Array] = None,   # [G*B, nl, D, N] fwd boundary states
    chunk: int = 128,
) -> Tuple[jax.Array, ...]:
    """Returns (dx, ddt_raw, dA, dBm, dCm, dDskip, ddt_bias), all fp32."""
    f32 = jnp.float32
    x, dt_raw, Bm, Cm, gy = (t.astype(f32) for t in (x, dt_raw, Bm, Cm, gy))
    A = A.astype(f32)
    G, B, L, D = x.shape
    N = A.shape[-1]
    chunk = min(chunk, L)
    while L % chunk:
        chunk //= 2
    nl = L // chunk

    dtp = jax.nn.softplus(dt_raw + dt_bias[:, None, None, :].astype(f32))

    def chunked(t):  # [G,B,L,...] -> [nl, G,B,chunk,...]
        return jnp.moveaxis(
            t.reshape(t.shape[:2] + (nl, chunk) + t.shape[3:]), 2, 0)

    xs = (chunked(x), chunked(dtp), chunked(Bm), chunked(Cm), chunked(gy))

    if hb is not None and hb.shape[1] == nl:
        h_ins = jnp.moveaxis(hb.reshape(G, B, nl, D, N), 2, 0).astype(f32)
    else:
        # boundary states not available at this chunking: recompute serially
        def fwd_chunk(h, inp):
            x_c, dtp_c, B_c, _, _ = inp
            a = jnp.exp(dtp_c[..., None] * A[:, None, None])
            b = (dtp_c * x_c)[..., None] * B_c[:, :, :, None, :]
            a_cum, b_scan = jax.lax.associative_scan(_combine, (a, b), axis=2)
            h_next = b_scan[:, :, -1] + a_cum[:, :, -1] * h
            return h_next, h

        _, h_ins = jax.lax.scan(
            fwd_chunk, jnp.zeros((G, B, D, N), f32), xs)

    # reverse pass over chunks
    def bwd_chunk(g_next, inp):
        (x_c, dtp_c, B_c, C_c, gy_c), h_in = inp
        grads, _, g_carry, dA_part = _chunk_grads(
            x_c, dtp_c, A, B_c, C_c, gy_c, h_in, g_next)
        return g_carry, (grads, dA_part)

    rev = lambda t: jnp.flip(t, axis=0)
    g0 = jnp.zeros((G, B, D, N), f32)
    _, ((dx_c, ddtp_c, dB_c, dC_c), dA_parts) = jax.lax.scan(
        bwd_chunk, g0, (tuple(rev(t) for t in xs), rev(h_ins)))

    def unchunk(t):  # [nl, G,B,chunk,...] (reverse order) -> [G,B,L,...]
        t = jnp.flip(t, axis=0)
        t = jnp.moveaxis(t, 0, 2)
        return t.reshape(t.shape[:2] + (L,) + t.shape[4:])

    dx = unchunk(dx_c)
    ddtp = unchunk(ddtp_c)
    dBm = unchunk(dB_c)
    dCm = unchunk(dC_c)
    dA = jnp.sum(dA_parts, axis=0)

    # D-skip and softplus/bias chains
    dx = dx + gy * Dskip.astype(f32)[:, None, None, :]
    dDskip = jnp.einsum("gbld,gbld->gd", gy, x)
    sig = jax.nn.sigmoid(dt_raw + dt_bias[:, None, None, :].astype(f32))
    ddt_raw = ddtp * sig
    ddt_bias = jnp.einsum("gbld->gd", ddt_raw)
    return dx, ddt_raw, dA, dBm, dCm, dDskip, ddt_bias
