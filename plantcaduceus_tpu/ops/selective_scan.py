"""Selective-scan (Mamba S6) recurrence — pure-JAX implementations.

This is the hot op of the Caduceus model. The reference outsources it to the
``mamba-ssm`` CUDA wheel (``selective_scan_cuda``; pinned in
/root/reference/env/requirements.txt); here it is implemented natively for TPU:

* ``selective_scan_sequential`` — ``lax.scan`` over time. Minimal memory, the
  numerical ground truth for tests, and the CPU fallback.
* ``selective_scan_associative`` — ``lax.associative_scan`` over the
  first-order linear recurrence. Work-efficient parallel prefix scan that XLA
  maps well to the VPU; materialises the ``[*, L, D, N]`` state tensors in HBM.
* ``ops.pallas_scan`` (separate module) — chunked Pallas kernel that keeps the
  state tensors in VMEM; selected via ``impl='pallas'``.

Recurrence (per batch row, channel d, state n), matching the semantics of the
CUDA kernel with ``delta_softplus=True``:

    dt'    = softplus(dt + dt_bias)
    a[t]   = exp(dt'[t,d] * A[d,n])              (A real, negative)
    h[t]   = a[t] * h[t-1] + dt'[t,d] * B[t,n] * x[t,d]
    y[t,d] = sum_n C[t,n] * h[t,d,n] + D[d] * x[t,d]

All shapes carry a leading *group* axis ``G`` so that the two scan directions
of a bidirectional Mamba block (which have distinct A/D/dt_bias parameters)
run in one batched call:

    x, dt : [G, B, L, D]
    A     : [G, D, N]
    Bm, Cm: [G, B, L, N]
    Dskip : [G, D]
    dt_bias: [G, D]
    y     : [G, B, L, D]

The scan carry is always float32 regardless of input dtype; outputs are cast
back to ``x.dtype``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _prep(x, dt, A, Bm, Cm, Dskip, dt_bias, dt_softplus):
    """Common fp32 upcast + dt activation. Returns fp32 tensors."""
    f32 = jnp.float32
    x = x.astype(f32)
    dt = dt.astype(f32)
    A = A.astype(f32)
    Bm = Bm.astype(f32)
    Cm = Cm.astype(f32)
    Dskip = Dskip.astype(f32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(f32)[:, None, None, :]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    return x, dt, A, Bm, Cm, Dskip


def selective_scan_sequential(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
) -> jax.Array:
    """Ground-truth sequential scan via ``lax.scan`` over the time axis."""
    out_dtype = x.dtype
    x, dt, A, Bm, Cm, Dskip = _prep(x, dt, A, Bm, Cm, Dskip, dt_bias, dt_softplus)
    G, B, L, D = x.shape
    N = A.shape[-1]

    # Time-major for lax.scan: [L, G, B, ...]
    xs = (
        jnp.moveaxis(x, 2, 0),
        jnp.moveaxis(dt, 2, 0),
        jnp.moveaxis(Bm, 2, 0),
        jnp.moveaxis(Cm, 2, 0),
    )
    h0 = jnp.zeros((G, B, D, N), jnp.float32)

    def step(h, inp):
        x_t, dt_t, B_t, C_t = inp  # [G,B,D], [G,B,D], [G,B,N], [G,B,N]
        a = jnp.exp(dt_t[..., None] * A[:, None])  # [G,B,D,N]
        b = (dt_t * x_t)[..., None] * B_t[:, :, None, :]  # [G,B,D,N]
        h = a * h + b
        y_t = jnp.einsum("gbdn,gbn->gbd", h, C_t)
        return h, y_t

    _, ys = jax.lax.scan(step, h0, xs)  # ys: [L, G, B, D]
    y = jnp.moveaxis(ys, 0, 2) + Dskip[:, None, None, :] * x
    return y.astype(out_dtype)


def selective_scan_associative(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
) -> jax.Array:
    """Parallel prefix scan over the linear recurrence.

    Combines pairs ``(a, b)`` with ``(a2*a1, a2*b1 + b2)`` — the standard
    first-order-recurrence monoid — using ``lax.associative_scan`` along L.
    """
    out_dtype = x.dtype
    x, dt, A, Bm, Cm, Dskip = _prep(x, dt, A, Bm, Cm, Dskip, dt_bias, dt_softplus)

    a = jnp.exp(dt[..., None] * A[:, None, None])  # [G,B,L,D,N]
    b = (dt * x)[..., None] * Bm[:, :, :, None, :]  # [G,B,L,D,N]

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=2)
    y = jnp.einsum("gbldn,gbln->gbld", h, Cm)
    y = y + Dskip[:, None, None, :] * x
    return y.astype(out_dtype)


_IMPLS = {
    "sequential": selective_scan_sequential,
    "associative": selective_scan_associative,
}


@functools.partial(jax.jit, static_argnames=("dt_softplus", "impl"))
def selective_scan(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bm: jax.Array,
    Cm: jax.Array,
    Dskip: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching entry point.

    ``impl``: auto | sequential | associative | pallas. ``auto`` picks the
    Pallas kernel on TPU (VMEM-resident state; the associative fallback's
    HBM state tensors OOM real batch sizes) and the associative scan
    elsewhere (CPU tests, interpret-free)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "associative"
    if impl == "pallas":
        from plantcaduceus_tpu.ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(
            x, dt, A, Bm, Cm, Dskip, dt_bias=dt_bias, dt_softplus=dt_softplus
        )
    try:
        fn = _IMPLS[impl]
    except KeyError:
        raise ValueError(f"unknown selective_scan impl {impl!r}") from None
    return fn(x, dt, A, Bm, Cm, Dskip, dt_bias=dt_bias, dt_softplus=dt_softplus)
