"""Optimizer / schedule factories (optax).

Covers the reference's recipes: AdamW with constant-with-warmup for MLM
pre-training (README pre-train command: lr 2e-4, warmup 1k) and linear decay
for LoRA fine-tuning (src/lora_fine_tune.py:260). DecoupledAdamW of the
Composer path == optax.adamw (decoupled weight decay).
"""

from __future__ import annotations

from typing import Optional

import optax


def make_schedule(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
) -> optax.Schedule:
    if name == "constant_with_warmup":
        if warmup_steps == 0:
            return optax.constant_schedule(learning_rate)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    if name == "linear":
        if total_steps is None:
            raise ValueError("linear schedule needs total_steps")
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
             optax.linear_schedule(learning_rate, 0.0, total_steps - warmup_steps)],
            [warmup_steps],
        )
    if name == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule needs total_steps")
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps)
    raise ValueError(f"unknown schedule {name!r}")


def _decay_mask(params):
    """Decay only matrix-like weights: skip norms, biases, A_log, D, dt bias
    (torch AdamW in the reference decays everything, but HF Trainer's default
    no_decay list excludes norms/biases — we follow that)."""
    import jax

    def rule(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        # "_b" suffix = bias by this codebase's naming convention (conv_b,
        # dt_proj_b, conv_x_b/conv_B_b/conv_C_b, ...); the ndim guard alone
        # can't catch them because stacked [n_layer, group, ...] axes make
        # every leaf matrix-like.
        skip = (any(s in name for s in ("norm", "bias", "A_log", "/D"))
                or name.endswith("_b"))
        return (not skip) and leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(
    learning_rate: float = 2e-4,
    schedule: str = "constant_with_warmup",
    warmup_steps: int = 1000,
    total_steps: Optional[int] = None,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = 1.0,
    params=None,
) -> optax.GradientTransformation:
    sched = make_schedule(schedule, learning_rate, warmup_steps, total_steps)
    mask = _decay_mask(params) if (params is not None and weight_decay > 0) else None
    tx = optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                     weight_decay=weight_decay, mask=mask)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
