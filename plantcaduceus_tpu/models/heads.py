"""Task heads over the Caduceus backbone.

Sequence classification / regression / multi-label — the capability surface
of the reference's ``AutoModelForSequenceClassification`` remote-code path
(src/lora_fine_tune.py:566-605: num_labels=2 classification, 1 regression,
N multi-label). Features are the RC-averaged channels (the strand-symmetric
embedding contract of src/train_XGBoost.py:108-113) pooled over the
sequence.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig


def rc_average(hidden: jax.Array, cfg: CaduceusConfig) -> jax.Array:
    """[B, L, hidden_size] -> [B, L, d_model] strand-symmetric features."""
    if not cfg.rcps:
        return hidden
    d = hidden.shape[-1] // 2
    fwd = hidden[..., :d]
    rev = jnp.flip(hidden[..., d:], axis=-1)
    return (fwd + rev) * 0.5


def pool(features: jax.Array, cfg: CaduceusConfig) -> jax.Array:
    """[B, L, d] -> [B, d] per config.pooling."""
    if cfg.pooling == "mean":
        return jnp.mean(features, axis=1)
    if cfg.pooling == "last":
        return features[:, -1]
    if cfg.pooling == "first":
        return features[:, 0]
    raise ValueError(f"unknown pooling {cfg.pooling!r}")


def init_head(rng: jax.Array, cfg: CaduceusConfig, num_labels: int,
              dtype=jnp.float32) -> Dict:
    scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.d_model, jnp.float32))
    return {
        "w": (jax.random.normal(rng, (cfg.d_model, num_labels)) * 0.02
              ).astype(dtype),
        "b": jnp.zeros((num_labels,), dtype),
    }


def sequence_logits(params: Dict, head: Dict, input_ids: jax.Array,
                    cfg: CaduceusConfig, dtype=jnp.bfloat16,
                    tp_axis: Optional[str] = None,
                    remat: bool = False, lora=None) -> jax.Array:
    """[B, num_labels] classification logits (or regression values).
    ``lora`` (see models.caduceus backbone) applies adapters on the
    activation path with PEFT dropout semantics."""
    h_work = caduceus.backbone(params, input_ids, cfg, dtype=dtype,
                               tp_axis=tp_axis, remat=remat, lora=lora)
    hidden = caduceus.readout_hidden(h_work, cfg)
    feats = pool(rc_average(hidden, cfg), cfg).astype(jnp.float32)
    return feats @ head["w"].astype(jnp.float32) + head["b"].astype(jnp.float32)


def task_loss(logits: jax.Array, labels: jax.Array, task_type: str) -> jax.Array:
    """Per-task loss matching HF's problem_type dispatch."""
    if task_type == "classification":
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        return jnp.mean(nll)
    if task_type == "regression":
        pred = logits[..., 0]
        return jnp.mean((pred - labels.astype(jnp.float32)) ** 2)
    if task_type == "multi_label":
        y = labels.astype(jnp.float32)
        z = logits
        # numerically stable BCE-with-logits
        return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
    raise ValueError(f"unknown task_type {task_type!r}")
