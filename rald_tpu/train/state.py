"""Train state: params + EMA + optimizer state as one pytree.

Replaces the reference's split model/EMA-param-list/optimizer/scaler state
(``engine_ae.py:21-31`` update_ema; ``misc.py:249-276`` loss scaler): on TPU
bf16 training needs no loss scaling (SURVEY.md §2b), EMA is a pytree map
fused into the jitted train step, and the optimizer is an optax chain
(global-norm clip -> AdamW), matching ``torch.optim.AdamW(lr=...)`` defaults
(betas 0.9/0.999, eps 1e-8, weight_decay 0.01 — the reference never passes
its ``train.weight_decay`` config value to the optimizer,
``main_ae.py:126``, ``main_generation.py:161``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, ema_rate: float = 0.999) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = ema_update(self.ema_params, new_params, ema_rate)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )


def ema_update(ema_params, params, rate: float = 0.999):
    """ema <- rate * ema + (1 - rate) * params (reference engine_ae.py:21-31)."""
    return jax.tree_util.tree_map(lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate), ema_params, params)


def make_optimizer(
    learning_rate: Callable | float,
    clip_grad: Optional[float] = None,
    weight_decay: float = 0.01,
    skip_nonfinite: bool = False,
    accum_iter: int = 1,
) -> optax.GradientTransformation:
    """Global-norm clip (reference misc.py:255-269) -> AdamW.

    ``skip_nonfinite`` wraps the chain in ``optax.apply_if_finite``: a
    non-finite gradient skips the update instead of poisoning the params —
    a fault-tolerance upgrade over the reference's process abort
    (engine_ae.py:103-105).

    ``accum_iter > 1`` wraps in ``optax.MultiSteps``: gradients are averaged
    over k micro-batches and applied every k-th step, matching the
    reference's loss/accum_iter + update_grad cadence (engine_ae.py:107-113).
    """
    chain = []
    if clip_grad is not None and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(float(clip_grad)))
    chain.append(
        optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_iter))
    return tx


def create_train_state(
    params,
    learning_rate: Callable | float,
    clip_grad: Optional[float] = None,
    weight_decay: float = 0.01,
    skip_nonfinite: bool = False,
    accum_iter: int = 1,
) -> TrainState:
    import jax.numpy as jnp

    tx = make_optimizer(learning_rate, clip_grad, weight_decay, skip_nonfinite, accum_iter)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # real copies, NOT aliases: the train step donates the whole state,
        # and donating the same buffer via two leaves is an XLA error
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        tx=tx,
    )


def cast_tree_bf16(tree):
    """Inference-only param cast: f32 leaves ride as bf16 (halves weight HBM
    re-reads, decode -17% measured — docs/DESIGN.md); other dtypes keep."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tree
    )
