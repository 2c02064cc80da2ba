"""Model card emission + hub-publishing analogue (reference
src/HF_pre_train.py:535-548: trainer.create_model_card / push_to_hub)."""

import json

import pytest

from plantcaduceus_tpu.compat import model_card
from plantcaduceus_tpu.models.config import CaduceusConfig

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4)


def test_write_model_card_contents(tmp_path):
    cfg = CaduceusConfig(**TINY)
    path = model_card.write_model_card(
        tmp_path / "final", cfg, finetuned_from="base-l20",
        dataset="synthetic", metrics={"loss": 1.25, "perplexity": 3.49},
        n_params=12345)
    text = path.read_text()
    # HF YAML metadata block with pipeline tag + base model + dataset
    assert text.startswith("---\n")
    head = text.split("---")[1]
    assert "pipeline_tag: fill-mask" in head
    assert "base_model: base-l20" in head
    assert "- synthetic" in head
    assert "value: 1.25" in head
    # body carries the config table and provenance
    assert f"| d_model | {cfg.d_model} |" in text
    assert "| parameters | 12,345 |" in text
    assert "Fine-tuned from `base-l20`" in text


def test_write_model_card_minimal(tmp_path):
    cfg = CaduceusConfig(**TINY)
    path = model_card.write_model_card(tmp_path, cfg)
    text = path.read_text()
    assert "base_model" not in text and "model-index" not in text
    assert "plantcaduceus_tpu" in text


def test_final_metrics_normalisation():
    out = model_card._final_metrics_from_log(
        {"loss": 1.5, "accuracy": "0.25", "junk": object()})
    assert out == {"loss": 1.5, "accuracy": 0.25}
    assert model_card._final_metrics_from_log(None) is None
    assert model_card._final_metrics_from_log({"x": object()}) is None


def test_push_to_hub_offline_error(tmp_path, monkeypatch):
    """Zero-egress environment: one clear RuntimeError naming the offline
    fallback command, not a deep HTTP stack trace."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")  # deterministic fast failure
    (tmp_path / "config.json").write_text("{}")
    with pytest.raises(RuntimeError, match="huggingface-cli upload"):
        model_card.push_to_hub(tmp_path, "org/repo")
    with pytest.raises(FileNotFoundError):
        model_card.push_to_hub(tmp_path / "missing", "org/repo")


def test_pretrain_cli_emits_model_card(tmp_path):
    """The pretrain CLI's final export carries README.md with final eval
    metrics (the reference's create_model_card branch)."""
    from plantcaduceus_tpu.cli import pretrain as pretrain_cli

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(TINY))
    pretrain_cli.main([
        "--dataset", "synthetic", "--config", str(cfg_path),
        "--window", "32", "--batch-size", "8", "--dtype", "float32",
        "--log-steps", "1", "--eval-steps", "2", "--save-steps", "3",
        "--max-steps", "3", "--output-dir", str(tmp_path / "run")])
    card = tmp_path / "run" / "final" / "README.md"
    assert card.exists()
    text = card.read_text()
    assert "pipeline_tag: fill-mask" in text
    assert "- synthetic" in text
    assert "perplexity" in text  # final eval metrics made it into the card
