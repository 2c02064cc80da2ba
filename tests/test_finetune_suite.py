"""Fine-tuning job suite (the GLUE-harness capability, SURVEY.md §2.3 B17)
over tiny datasets: multi-task manifest -> per-job train/evaluate ->
aggregated suite_metrics.json."""

import json

import jax
import numpy as np
import pandas as pd

from plantcaduceus_tpu.cli import finetune_suite
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.train.checkpoint import export_params

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4, expand=2, d_conv=4)


def _write_parquet(path, rng, n, L=32, task="classification"):
    ids = rng.integers(7, 11, size=(n, L)).astype(np.int32)
    df = pd.DataFrame({"input_ids": list(ids)})
    if task == "regression":
        df["label"] = rng.standard_normal(n).astype(np.float32)
    else:
        df["label"] = rng.integers(0, 2, size=n)
    df.to_parquet(path)


def test_suite_runs_jobs_and_aggregates(tmp_path, rng):
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    model_dir = tmp_path / "model"
    export_params(model_dir, params, cfg)

    for name, task in [("clsA", "classification"), ("regrB", "regression")]:
        _write_parquet(tmp_path / f"{name}_train.parquet", rng, 16, task=task)
        _write_parquet(tmp_path / f"{name}_valid.parquet", rng, 8, task=task)

    manifest = {
        "defaults": {"model-name": str(model_dir), "max-steps": 4,
                     "train-batch-size": 8, "eval-batch-size": 8,
                     "eval-steps": 4, "save-steps": 4, "warmup-steps": 1,
                     "no-bf16": True},
        "jobs": [
            {"name": "clsA",
             "train_dir": str(tmp_path / "clsA_train.parquet"),
             "valid_dir": str(tmp_path / "clsA_valid.parquet"),
             "task_type": "classification"},
            {"name": "regrB",
             "train_dir": str(tmp_path / "regrB_train.parquet"),
             "valid_dir": str(tmp_path / "regrB_valid.parquet"),
             "task_type": "regression",
             "overrides": {"full-finetune": True}},
        ],
    }
    out_dir = tmp_path / "suite"
    results = finetune_suite.run_suite(manifest, out_dir)

    saved = json.loads((out_dir / "suite_metrics.json").read_text())
    assert set(saved) == {"clsA", "regrB"}
    assert "accuracy" in saved["clsA"] and "rmse" in saved["regrB"]
    assert results == saved
    # per-job checkpoints exist and are re-aggregatable without retraining
    assert (out_dir / "clsA" / "final" / "adapter_config.json").exists()
    again = finetune_suite.run_suite(manifest, out_dir, only={"clsA"},
                                     skip_train=True)
    assert set(again) == {"clsA"}
