"""int8-projection inference: quantization math + score rank stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.engine import zero_shot
from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.ops import quant
from plantcaduceus_tpu.parallel import mesh as meshlib


def test_weight_quant_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    w8, scale = quant.quantize_weight(w, reduce_axis=0)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = w8.astype(jnp.float32) * scale
    # symmetric rounding: error <= scale/2 elementwise
    assert float(jnp.max(jnp.abs(deq - w) / scale)) <= 0.5 + 1e-6


def test_int8_dense_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((8, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.1, jnp.float32)
    w8, sw = quant.quantize_weight(w, reduce_axis=0)
    got = quant.int8_dense(x, w8, sw)
    want = x @ w
    # int8 x int8 over 64-deep contractions: ~1% relative error
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.02, err
    assert got.shape == (8, 16, 48)


def test_quantized_scores_rank_stable(rng):
    """End to end on a tiny pallas-path model (interpret mode): int8
    projections shift the zero-shot scores only by quantization noise —
    high Pearson/Spearman agreement with the bf16/f32 engine."""
    scipy_stats = pytest.importorskip("scipy.stats")
    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=8,
                         scan_impl="pallas")
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    tok = DnaTokenizer()
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    L = 64
    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(24)]
    refs = [s[L // 2] for s in seqs]
    alts = ["ACGT"[(("ACGT").index(r) + 1) % 4] for r in refs]

    scores = {}
    with pltpu.force_tpu_interpret_mode():
        for name, q in (("f32", False), ("int8", True)):
            runner = InferenceRunner(params, cfg, mesh=mesh,
                                     dtype=jnp.float32, batch_size=8,
                                     quantize=q)
            probs = zero_shot.nucleotide_probs(runner, tok, seqs,
                                               token_idx=L // 2,
                                               progress=False)
            scores[name] = zero_shot.log_ratio_scores(probs, refs, alts)

    rho = scipy_stats.spearmanr(scores["f32"], scores["int8"]).statistic
    assert rho > 0.95, rho
    np.testing.assert_allclose(scores["int8"], scores["f32"],
                               rtol=0.25, atol=0.15)


def test_quantize_rejects_unsupported_paths(rng):
    cfg2 = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16,
                          ssm_variant="mamba2", d_state=8, head_dim=16,
                          chunk_size=32)
    params2 = caduceus.init_params(jax.random.PRNGKey(0), cfg2)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    with pytest.raises(NotImplementedError, match="mamba1"):
        InferenceRunner(params2, cfg2, mesh=mesh, quantize=True)

    # associative (non-pallas) impl: the model raises at trace time
    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=8,
                         scan_impl="associative")
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=8, quantize=True)
    ids = np.asarray(rng.integers(7, 11, size=(8, 32)), np.int32)
    with pytest.raises(NotImplementedError, match="int8 projections"):
        runner.masked_probs(ids, [7, 8, 9, 10], 16, progress=False)
