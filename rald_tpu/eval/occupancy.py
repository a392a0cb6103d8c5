"""Occupancy IoU / accuracy at logit threshold 0 (reference engine_ae.py:90-101)."""
from __future__ import annotations

import jax.numpy as jnp


def occupancy_metrics(logits, labels, threshold: float = 0.0, mask=None) -> dict:
    """Per-batch mean IoU and accuracy. ``logits``/``labels``: (B, Q).

    ``mask`` (B, Q) marks valid queries (1) vs bucket padding (0) — padded
    entries contribute nothing (ragged eval, ``sampling: false``).
    """
    pred = (logits >= threshold).astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if mask is None:
        accuracy = jnp.mean(jnp.sum(pred == labels, axis=1) / labels.shape[1])
        intersection = jnp.sum(pred * labels, axis=1)
        union = jnp.sum((pred + labels) > 0, axis=1) + 1e-5
    else:
        mask = mask.astype(jnp.float32)
        valid = jnp.sum(mask, axis=1) + 1e-5
        accuracy = jnp.mean(jnp.sum((pred == labels) * mask, axis=1) / valid)
        intersection = jnp.sum(pred * labels * mask, axis=1)
        union = jnp.sum(((pred + labels) > 0) * mask, axis=1) + 1e-5
    iou = jnp.mean(intersection / union)
    return {"iou": iou, "accuracy": accuracy}
