"""Occupancy IoU / accuracy at logit threshold 0 (reference engine_ae.py:90-101)."""
from __future__ import annotations

import jax.numpy as jnp


def occupancy_metrics(logits, labels, threshold: float = 0.0) -> dict:
    """Per-batch mean IoU and accuracy. ``logits``/``labels``: (B, Q)."""
    pred = (logits >= threshold).astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    accuracy = jnp.mean(jnp.sum(pred == labels, axis=1) / labels.shape[1])
    intersection = jnp.sum(pred * labels, axis=1)
    union = jnp.sum((pred + labels) > 0, axis=1) + 1e-5
    iou = jnp.mean(intersection / union)
    return {"iou": iou, "accuracy": accuracy}
