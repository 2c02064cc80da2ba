"""PEFT adapter interchange: import released-format LoRA dirs, export back.

Synthetic adapter state dicts use PEFT's naming
(base_model.model...layers.N.mixer[.mamba_fwd].{in,x,out}_proj.lora_{A,B}.weight)
and torch Linear math (delta W = B @ A, scaled alpha/r); the importer must
land every tensor on the framework's stacked adapter tree with the exact
same split/transpose rules as compat/hf_import (in_proj -> x/z halves,
x_proj -> dt/B/C row blocks). Mirrors the strict-import bijection tests.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from plantcaduceus_tpu.compat import peft_adapter
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.train.lora import LoraConfig, apply_lora

CFG = CaduceusConfig(d_model=16, n_layer=2, vocab_size=16, d_state=4)
RANK = 4


def _write(tmp_path, sd, meta=None):
    d = tmp_path / "adapter"
    d.mkdir(exist_ok=True)
    meta = meta or {
        "peft_type": "LORA", "task_type": "SEQ_CLS",
        "r": RANK, "lora_alpha": 16.0, "lora_dropout": 0.05,
        "target_modules": ["in_proj", "x_proj", "out_proj"],
        "base_model_name_or_path": "kuleshov-group/PlantCaduceus_l20",
    }
    (d / "adapter_config.json").write_text(json.dumps(meta))
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v, np.float32))
                for k, v in sd.items()}, str(d / "adapter_model.bin"))
    return d


def _synthetic_sd(rng, per_direction_xproj=False, with_head=True,
                  n_labels=3):
    d, di = CFG.d_model, CFG.d_inner
    R, N = CFG.dt_rank, CFG.d_state
    f = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {}
    pre = "base_model.model.backbone.layers"
    for i in range(CFG.n_layer):
        sd[f"{pre}.{i}.mixer.in_proj.lora_A.weight"] = f(RANK, d)
        sd[f"{pre}.{i}.mixer.in_proj.lora_B.weight"] = f(2 * di, RANK)
        sd[f"{pre}.{i}.mixer.out_proj.lora_A.weight"] = f(RANK, di)
        sd[f"{pre}.{i}.mixer.out_proj.lora_B.weight"] = f(d, RANK)
        if per_direction_xproj:
            for g, nm in enumerate(("mamba_fwd", "mamba_rev")):
                sd[f"{pre}.{i}.mixer.{nm}.x_proj.lora_A.weight"] = f(RANK, di)
                sd[f"{pre}.{i}.mixer.{nm}.x_proj.lora_B.weight"] = \
                    f(R + 2 * N, RANK)
        else:
            sd[f"{pre}.{i}.mixer.x_proj.lora_A.weight"] = f(RANK, di)
            sd[f"{pre}.{i}.mixer.x_proj.lora_B.weight"] = f(R + 2 * N, RANK)
    if with_head:
        sd["base_model.model.score.modules_to_save.weight"] = f(n_labels, d)
        sd["base_model.model.score.modules_to_save.bias"] = f(n_labels)
    return sd


def test_import_matches_torch_math(rng, tmp_path):
    sd = _synthetic_sd(rng)
    d = _write(tmp_path, sd)
    adapters, head, cfg_l, task_type, base = \
        peft_adapter.import_peft_adapter(d, CFG)
    assert task_type == "classification"
    assert base.endswith("PlantCaduceus_l20")
    assert (cfg_l.r, cfg_l.alpha, cfg_l.dropout) == (RANK, 16.0, 0.05)
    di = CFG.d_inner
    scale = cfg_l.alpha / cfg_l.r
    pre = "base_model.model.backbone.layers"
    for i in range(CFG.n_layer):
        A = sd[f"{pre}.{i}.mixer.in_proj.lora_A.weight"]
        B = sd[f"{pre}.{i}.mixer.in_proj.lora_B.weight"]
        # torch: W_in[:di] += scale * B[:di] @ A; ours is the transpose
        np.testing.assert_allclose(
            adapters["in_proj_x"]["a"][i, 0] @ adapters["in_proj_x"]["b"][i, 0],
            (B[:di] @ A).T, rtol=1e-6)
        np.testing.assert_allclose(
            adapters["in_proj_z"]["a"][i, 0] @ adapters["in_proj_z"]["b"][i, 0],
            (B[di:] @ A).T, rtol=1e-6)
        Ax = sd[f"{pre}.{i}.mixer.x_proj.lora_A.weight"]
        Bx = sd[f"{pre}.{i}.mixer.x_proj.lora_B.weight"]
        R = CFG.dt_rank
        for g in range(2):  # tied module replicated onto the G axis
            np.testing.assert_allclose(
                adapters["x_proj_dt"]["a"][i, g] @ adapters["x_proj_dt"]["b"][i, g],
                (Bx[:R] @ Ax).T, rtol=1e-6)
        Ao = sd[f"{pre}.{i}.mixer.out_proj.lora_A.weight"]
        Bo = sd[f"{pre}.{i}.mixer.out_proj.lora_B.weight"]
        np.testing.assert_allclose(
            adapters["out_proj"]["a"][i, 0] @ adapters["out_proj"]["b"][i, 0],
            (Bo @ Ao).T, rtol=1e-6)
    # head: torch Linear [out, in] -> ours [in, out] (+bias)
    np.testing.assert_allclose(
        head["w"], sd["base_model.model.score.modules_to_save.weight"].T)
    assert head["b"].shape == (3,)
    del scale


def test_import_applies_to_model(rng, tmp_path):
    """apply_lora with imported adapters shifts exactly the adapted leaves."""
    import jax

    from plantcaduceus_tpu.models import caduceus

    params = caduceus.init_params(jax.random.PRNGKey(0), CFG)
    d = _write(tmp_path, _synthetic_sd(rng, with_head=False))
    adapters, head, cfg_l, *_ = peft_adapter.import_peft_adapter(d, CFG)
    assert head is None
    eff = apply_lora(params, {k: {p: np.asarray(v) for p, v in ab.items()}
                              for k, ab in adapters.items()}, cfg_l)
    for name in ("in_proj_x", "in_proj_z", "out_proj", "x_proj_dt",
                 "x_proj_B", "x_proj_C"):
        assert not np.allclose(np.asarray(eff["blocks"][name]),
                               np.asarray(params["blocks"][name]))
    for name in ("conv_w", "dt_proj_w", "A_log"):
        np.testing.assert_array_equal(np.asarray(eff["blocks"][name]),
                                      np.asarray(params["blocks"][name]))


def test_per_direction_xproj(rng, tmp_path):
    d = _write(tmp_path, _synthetic_sd(rng, per_direction_xproj=True,
                                       with_head=False))
    adapters, *_ = peft_adapter.import_peft_adapter(d, CFG)
    # directions carry distinct adapters now
    assert not np.allclose(adapters["x_proj_dt"]["a"][0, 0],
                           adapters["x_proj_dt"]["a"][0, 1])


def test_strict_rejects_stray_and_bad_shapes(rng, tmp_path):
    sd = _synthetic_sd(rng, with_head=False)
    sd["base_model.model.mystery.lora_A.weight"] = \
        rng.standard_normal((4, 16)).astype(np.float32)
    d = _write(tmp_path, sd)
    with pytest.raises(ValueError, match="never.*consumed|consumed"):
        peft_adapter.import_peft_adapter(d, CFG)

    sd2 = _synthetic_sd(rng, with_head=False)
    k = "base_model.model.backbone.layers.0.mixer.in_proj.lora_B.weight"
    sd2[k] = sd2[k].T.copy()  # transposed
    (tmp_path / "t2").mkdir(exist_ok=True)
    d2 = _write(tmp_path / "t2", sd2)
    with pytest.raises(ValueError, match="in_proj adapter shapes"):
        peft_adapter.import_peft_adapter(d2, CFG)


def test_head_width_mismatch_raises(rng, tmp_path):
    sd = _synthetic_sd(rng, with_head=False)
    sd["base_model.model.score.modules_to_save.weight"] = \
        rng.standard_normal((2, 2 * CFG.d_model)).astype(np.float32)
    d = _write(tmp_path, sd)
    with pytest.raises(ValueError, match="head in_features"):
        peft_adapter.import_peft_adapter(d, CFG)


def test_roundtrip_export_import(rng, tmp_path):
    d = _write(tmp_path, _synthetic_sd(rng))
    adapters, head, cfg_l, task_type, base = \
        peft_adapter.import_peft_adapter(d, CFG)
    out = tmp_path / "exported"
    peft_adapter.export_peft_adapter(out, adapters, head, CFG, cfg_l,
                                     task_type, base)
    assert peft_adapter.is_peft_adapter_dir(out)
    adapters2, head2, cfg_l2, task_type2, base2 = \
        peft_adapter.import_peft_adapter(out, CFG)
    assert (cfg_l2, task_type2, base2) == (cfg_l, task_type, base)
    for name, ab in adapters.items():
        for p in ("a", "b"):
            np.testing.assert_allclose(adapters2[name][p], ab[p],
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{name}.{p}")
    np.testing.assert_allclose(head2["w"], head["w"], rtol=1e-6)
    np.testing.assert_allclose(head2["b"], head["b"], rtol=1e-6)


def test_export_rejects_independent_lora_A(rng, tmp_path):
    """Framework-trained adapters (independent A per split) cannot express
    PEFT's fused Linear — export must refuse, not silently corrupt."""
    import jax

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.train.lora import init_lora

    params = caduceus.init_params(jax.random.PRNGKey(0), CFG)
    adapters = init_lora(jax.random.PRNGKey(1), params, LoraConfig(r=4))
    adapters = {k: {p: np.asarray(v) for p, v in ab.items()}
                for k, ab in adapters.items()}
    with pytest.raises(ValueError, match="independent lora_A"):
        peft_adapter.export_peft_adapter(tmp_path / "x", adapters, None, CFG,
                                         LoraConfig(r=4), "classification")


def test_cli_evaluate_accepts_peft_dir(rng, tmp_path):
    """End-to-end: lora_fine_tune evaluate on a PEFT-format adapter dir
    (the released-adapter workflow, reference lora_fine_tune.py:502-515)."""
    import jax
    import pandas as pd

    from plantcaduceus_tpu.cli.lora_fine_tune import main
    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus

    params = caduceus.init_params(jax.random.PRNGKey(0), CFG)
    base = tmp_path / "base"
    export_hf_dir(base, params, CFG)

    L = 32
    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(16)]
    tsv = tmp_path / "data.tsv"
    pd.DataFrame({"sequence": seqs,
                  "label": rng.integers(0, 2, 16)}).to_csv(
        tsv, sep="\t", index=False)
    pq = tmp_path / "data.parquet"
    main(["tokenize", "--data-dir", str(tsv), "--output-path", str(pq),
          "--model-name", str(base), "--sequence-length", str(L)])

    peft_dir = _write(tmp_path, _synthetic_sd(rng, n_labels=2))
    metrics_json = tmp_path / "m.json"
    main(["evaluate", "--checkpoint-dir", str(peft_dir),
          "--data-dir", str(pq), "--model-name", str(base),
          "--batch-size", "8", "--metrics-json", str(metrics_json)])
    m = json.loads(metrics_json.read_text())
    assert "accuracy" in m and 0.0 <= m["accuracy"] <= 1.0
