"""Evaluation metrics shared by the LoRA / XGBoost / zero-shot-eval CLIs.

Mirrors the reference's sklearn/scipy metric sets:
classification acc/F1/AUROC/AP (src/lora_fine_tune.py:517-530), regression
MSE/RMSE/MAE/R2/Pearson/Spearman (:533-551), micro-averaged multilabel
(:554-563), and ROC/PR curves for XGBoost (src/train_XGBoost.py:126-132).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def classification_metrics(logits: np.ndarray, labels: np.ndarray) -> Dict:
    from sklearn.metrics import (accuracy_score, average_precision_score,
                                 f1_score, roc_auc_score)

    probs = softmax(logits, axis=1)
    preds = logits.argmax(axis=1)
    scores = probs[:, 1]
    return {
        "accuracy": float(accuracy_score(labels, preds)),
        "f1": float(f1_score(labels, preds)),
        "roc_auc": float(roc_auc_score(labels, scores)),
        "average_precision": float(average_precision_score(labels, scores)),
        "balance": float(np.sum(labels) / len(labels)),
    }


def regression_metrics(predictions: np.ndarray, labels: np.ndarray) -> Dict:
    from scipy.stats import pearsonr, spearmanr

    predictions = np.asarray(predictions).squeeze()
    labels = np.asarray(labels, np.float64)
    mse = float(((predictions - labels) ** 2).mean())
    ss_tot = float(((labels - labels.mean()) ** 2).sum())
    ss_res = float(((labels - predictions) ** 2).sum())
    return {
        "mse": mse,
        "rmse": float(np.sqrt(mse)),
        "mae": float(np.abs(predictions - labels).mean()),
        "r2": float(1 - ss_res / (ss_tot + 1e-8)),
        "pearson_r": float(pearsonr(predictions, labels)[0]),
        "spearman_r": float(spearmanr(predictions, labels)[0]),
    }


def multilabel_metrics(logits: np.ndarray, labels: np.ndarray) -> Dict:
    from sklearn.metrics import (accuracy_score, average_precision_score,
                                 f1_score, roc_auc_score)

    probs = sigmoid(logits)
    preds = (probs > 0.5).astype(int)
    return {
        "accuracy": float(accuracy_score(labels, preds)),
        "f1": float(f1_score(labels, preds, average="micro")),
        "roc_auc": float(roc_auc_score(labels, probs, average="micro")),
        "average_precision": float(
            average_precision_score(labels, probs, average="micro")),
    }


def binary_curve_metrics(scores: np.ndarray, labels: np.ndarray) -> Dict:
    """ROC/PR curves + AUCs (the XGBoost evaluate_model contract)."""
    from sklearn import metrics as skm

    fpr, tpr, _ = skm.roc_curve(labels, scores)
    precision, recall, _ = skm.precision_recall_curve(labels, scores)
    return {
        "fpr": fpr, "tpr": tpr,
        "precision": precision, "recall": recall,
        "roc_auc": float(skm.auc(fpr, tpr)),
        "prauc": float(skm.average_precision_score(labels, scores)),
    }
