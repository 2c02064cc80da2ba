"""Full fine-tuning path (FineTuningStrategy.FULL capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from plantcaduceus_tpu.models import caduceus, heads
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import lora as lora_lib

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4, expand=2, d_conv=4)


def test_full_finetune_descends_and_updates_backbone(rng):
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    head = heads.init_head(jax.random.PRNGKey(1), cfg, 2)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8))
    opt = optax.adam(5e-3)
    train_step, infer_fn = lora_lib.make_full_finetune_step(
        cfg, opt, mesh, task_type="classification", dtype=jnp.float32,
        remat=False)
    state = lora_lib.LoraTrainState(params, head,
                                    opt.init((params, head)),
                                    jnp.zeros((), jnp.int32))
    ids = jnp.asarray(rng.integers(7, 11, size=(8, 32)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, size=(8,)))
    batch = {"input_ids": ids, "labels": labels}
    emb0 = np.asarray(params["embedding"]).copy()
    losses = []
    for _ in range(6):
        state, m = train_step(state, None, batch, None)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # backbone parameters actually moved (unlike LoRA)
    assert not np.allclose(np.asarray(state.adapters["embedding"]), emb0)
    logits = infer_fn(state, None, batch)
    assert logits.shape == (8, 2)
