"""LR schedule: per-iteration linear warmup + half-cosine decay.

Exact re-derivation of ``utils/lr_sched.py:9-21`` (fractional-epoch
formulation) as an optax-compatible step schedule, plus the effective-batch
base-LR scaling rule from ``main_ae.py:111-114``.
"""
from __future__ import annotations

import jax.numpy as jnp


def scale_base_lr(blr: float, batch_size: int, accum_iter: int, world_size: int) -> float:
    """lr = blr * eff_batch / 256 (reference main_ae.py:111-114)."""
    return float(blr) * batch_size * accum_iter * world_size / 256.0


def warmup_cosine_schedule(
    lr: float,
    min_lr: float,
    warmup_epochs: float,
    epochs: float,
    steps_per_epoch: int,
):
    """optax schedule(step) reproducing ``adjust_learning_rate`` with
    ``epoch = step / steps_per_epoch`` (the reference passes
    ``data_iter_step / len(data_loader) + epoch``, engine_ae.py:58-59)."""
    lr = float(lr)
    min_lr = float(min_lr)

    def schedule(step):
        epoch = step / steps_per_epoch
        warm = lr * epoch / warmup_epochs if warmup_epochs > 0 else lr
        denom = max(epochs - warmup_epochs, 1e-8)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / denom))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
