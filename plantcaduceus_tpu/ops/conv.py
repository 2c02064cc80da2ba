"""Short causal depthwise convolution — the Mamba conv prologue.

Replaces the reference's ``causal_conv1d`` CUDA kernel
(/root/reference/env/requirements.txt: causal-conv1d==1.4.0). With kernel
width K=4 the convolution is cheapest on TPU as K shifted multiply-adds,
which XLA fuses into the surrounding elementwise graph — no im2col, no
explicit convolution op, no HBM round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    activation: Optional[str] = "silu",
) -> jax.Array:
    """Depthwise causal 1-D convolution along the second-to-last axis.

    x: [..., L, D]  activations
    w: [..., D, K]  per-channel taps, tap K-1 multiplies the current step.
       Leading axes of ``w``/``b`` (e.g. a direction group axis) must broadcast
       against the leading axes of ``x``.
    b: [..., D] bias or None.

    Equivalent to torch ``nn.Conv1d(D, D, K, groups=D, padding=K-1)[..., :L]``
    as used inside ``mamba_ssm.Mamba`` (see SURVEY.md §2.2).
    """
    K = w.shape[-1]
    L = x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 2) + [(K - 1, 0), (0, 0)]
    xp = jnp.pad(x, pad)

    def _bcast(v):  # [*P, D] -> [*P, 1, ..., 1, D] matching x's rank
        return v.reshape(v.shape[:-1] + (1,) * (x.ndim - v.ndim) + v.shape[-1:])

    y = None
    for k in range(K):
        tap = xp[..., k : k + L, :] * _bcast(w[..., k])
        y = tap if y is None else y + tap
    if b is not None:
        y = y + _bcast(b)
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unsupported activation {activation!r}")
    return y
