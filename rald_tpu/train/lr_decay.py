"""Layer-wise learning-rate decay groups.

Capability parity with reference ``utils/lr_decay.py:8-68`` (present but
unused by the mains): assign each parameter a per-layer LR scale
``decay^(num_layers - layer_id)`` so early layers learn slower. The torch
version builds optimizer param groups; the optax-native form is a label fn
for ``optax.multi_transform`` (or a mask-based scale chain) over the flax
param tree.
"""
from __future__ import annotations

import re
from typing import Callable

import jax
import optax


def layer_id_fn(depth: int) -> Callable[[tuple], int]:
    """Map a flax param path to a layer id (0 = embeddings/input side).

    Mirrors the reference's grouping (lr_decay.py:30-52): input embeddings
    get layer 0, transformer block ``i`` gets ``i + 1``, everything else
    (heads, final norms) gets ``depth + 1``.
    """

    def fn(path: tuple) -> int:
        names = [str(getattr(p, "key", p)) for p in path]
        # only the TOP-LEVEL module decides the layer (a block's own
        # 'proj_in' must not be mistaken for the model input projection)
        top = names[0] if names else ""
        if top in ("point_embed", "proj_in", "map_noise", "s_latents", "d_latents"):
            return 0
        m = re.match(r"block_(\d+)", top)
        if m:
            return int(m.group(1)) + 1
        return depth + 1

    return fn


def lr_decay_scales(params, depth: int, decay: float = 0.75):
    """Per-leaf LR scale tree: ``decay^(depth + 1 - layer_id)``."""
    fn = layer_id_fn(depth)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: decay ** (depth + 1 - fn(path)), params
    )


def scale_by_layer_decay(params, depth: int, decay: float = 0.75) -> optax.GradientTransformation:
    """optax transform multiplying updates by the per-layer scale (chain it
    after the optimizer, matching the reference's ``lr * lr_scale``
    semantics at lr_sched.py:17-20)."""
    scales = lr_decay_scales(params, depth, decay)

    def init_fn(_):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)
