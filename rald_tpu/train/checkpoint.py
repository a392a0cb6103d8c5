"""Checkpoint save/resume (orbax), matching the reference's semantics.

Reference surface (``utils/misc.py:293-365``): ``checkpoint-{epoch}`` dirs
holding model + EMA + optimizer + epoch, written every ``save_ckpt_freq``
epochs (cadence enforced by the trainer, ``main_ae.py:159-162``); resume
restores params/EMA/optimizer/epoch; eval loads a specific checkpoint.

TPU notes: orbax writes sharded arrays natively — the same checkpoint works
single-chip and across a mesh (rank-0-only gating is handled inside orbax
for multi-host). The loss-scaler state of the reference has no TPU
equivalent (bf16 training needs no scaler).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str | os.PathLike):
        self.output_dir = Path(output_dir).resolve()
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int | str) -> Path:
        return self.output_dir / f"checkpoint-{epoch}"

    def save(self, state, epoch: int, extra: Optional[dict] = None) -> Path:
        """Persist {params, ema_params, opt_state, step} (+ extra leaves)."""
        payload = {
            "params": state.params,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": epoch,
        }
        if extra:
            payload["extra"] = extra
        path = self._path(epoch)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, state, path: str | os.PathLike | int | None = None):
        """Restore into the structure of ``state``; returns (state, epoch).

        ``path`` may be an epoch number, an explicit checkpoint dir, or None
        (latest in ``output_dir``).
        """
        if path is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"No checkpoints under {self.output_dir}")
            path = self._path(epoch)
        elif isinstance(path, int):
            path = self._path(path)
        path = Path(path).resolve()

        template = {
            "params": _abstract(state.params),
            "ema_params": _abstract(state.ema_params),
            "opt_state": _abstract(state.opt_state),
            "step": _abstract(state.step),
            "epoch": 0,
        }
        # tolerate checkpoints written with an 'extra' key
        import json

        meta = path / "_CHECKPOINT_METADATA"
        has_extra = False
        if meta.exists():
            try:
                has_extra = "extra" in json.loads(meta.read_text()).get("item_handlers", {})
            except Exception:
                pass
        restored = self._ckptr.restore(path, template)
        new_state = state.replace(
            params=restored["params"],
            ema_params=restored["ema_params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        del has_extra
        return new_state, int(restored["epoch"])

    def restore_params(self, abstract_params, path: str | os.PathLike, key: str = "params"):
        """Load a single param tree (e.g. frozen VAE weights for stage 2).

        Restores the raw checkpoint (orbax rejects sub-templates) and maps
        the ``key`` subtree onto ``abstract_params`` — tree_map doubles as a
        structure/shape check.
        """
        import jax.numpy as jnp

        path = Path(path).resolve()
        raw = self._ckptr.restore(path)
        sub = raw[key]
        return jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, getattr(t, "dtype", None)), abstract_params, sub
        )

    def latest_epoch(self) -> Optional[int]:
        epochs = [
            int(m.group(1))
            for p in self.output_dir.glob("checkpoint-*")
            if (m := re.fullmatch(r"checkpoint-(\d+)", p.name))
        ]
        return max(epochs) if epochs else None


def _abstract(tree: Any):
    """Shape/dtype template that preserves each array's sharding, so restore
    places arrays exactly where the live state lives (e.g. replicated over
    the mesh) instead of on a single device."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return ocp.utils.to_shape_dtype_struct(x)

    return jax.tree_util.tree_map(leaf, tree)
