"""Stage-1 VAE training/eval engine.

Capability parity with ``engine_ae.py`` (:33-155 train_one_epoch, :157-290
evaluate) and the ``main_ae.py`` wiring around it:

- loss = 0.1*BCE(vol) + 1.0*BCE(near) + 1e-3*KL with the vol/near split at
  ``in_voxel_num`` (engine_ae.py:79-86; weights from ``train.vol_weight`` /
  ``train.near_weight``), train IoU/accuracy at logit 0 (:90-101),
  per-iteration warmup-cosine LR (:58-59), global-norm clip 10, EMA 0.999.
- evaluate: loss/IoU on the eval query set; Chamfer via a fresh uniform
  query grid decoded and thresholded at 0 (engine_ae.py:229-274), optional
  EMA weight swap (:167-179).

TPU re-design:
- the whole optimizer step (forward, loss, backward, clip, AdamW, EMA) is
  ONE jitted function; data parallelism is just batch-axis sharding — XLA
  inserts the gradient all-reduce (no DDP wrapper, no loss scaler: bf16
  needs none).
- NaN handling: the reference kills the process from Python per step
  (engine_ae.py:103-105). Synchronizing every step to check would stall the
  TPU pipeline, so the NaN check runs on the host against the step's
  *returned* metrics (one step late, same effect).
"""
from __future__ import annotations

import math
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rald_tpu import geometry as geo
from rald_tpu.eval.chamfer import chamfer_and_fscore_batch
from rald_tpu.eval.occupancy import occupancy_metrics
from rald_tpu.eval.queries import build_query_grid
from rald_tpu.models.registry import get_ae_model
from rald_tpu.parallel.mesh import make_mesh, shard_batch
from rald_tpu.train.metrics import MetricLogger
from rald_tpu.train.schedule import scale_base_lr, warmup_cosine_schedule
from rald_tpu.train.state import TrainState, create_train_state


def bce_with_logits(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


class AEEngine:
    def __init__(self, cfg, mesh=None, seed: Optional[int] = None, dtype=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = int(cfg.system.get("seed", 0) if seed is None else seed)
        if dtype is None:
            dtype = jnp.dtype(cfg.system.get("compute_dtype", "float32"))
        self.dtype = dtype

        lidar = cfg.dataset.lidar
        self.num_samples = int(lidar.num_samples)
        self.in_voxel_num = int(self.num_samples * float(lidar.query_ratio))
        # F-score distance threshold in metres (paper metric; extension —
        # the reference computes only Chamfer)
        self.fscore_tau = float(cfg.get("eval", {}).get("fscore_tau", 0.1))
        # reference sizes the model from lidar_ae.point_cloud_size (an anchor
        # to num_samples in the shipped configs; main_ae.py:102)
        n_model = int(cfg.lidar_ae.get("point_cloud_size", self.num_samples))
        self.model = get_ae_model(cfg.lidar_ae.name, N=n_model, dtype=dtype)
        overrides = cfg.lidar_ae.get("overrides")  # scaled-down variants (tests/benchmarks)
        if overrides:
            self.model = self.model.copy(**overrides)

        # eval-only fast paths (system.fast_inference, default on): folded
        # decode tail everywhere, Pallas fused GEGLU FF on TPU (no autodiff
        # rule — the train step keeps the unfused modules). Same param tree.
        fast = bool(cfg.system.get("fast_inference", True))
        on_tpu = jax.default_backend() == "tpu"
        self.model_eval = (
            self.model.copy(fold_decode_tail=True, use_fused_ff=on_tpu)
            if fast
            else self.model
        )

        t = cfg.train
        self.vol_weight = float(t.get("vol_weight", 0.1))
        self.near_weight = float(t.get("near_weight", 1.0))
        self.kl_weight = 1e-3  # engine_ae.py:48
        self.ema_rate = 0.999
        self.clip_grad = float(t.get("clip_grad", 0) or 0)
        self.skip_nonfinite = bool(t.get("skip_nonfinite_updates", False))
        self.accum_iter = int(t.get("accum_iter", 1) or 1)
        self.epochs = int(t.epochs)
        self.warmup_epochs = float(t.get("warmup_epochs", 0))
        self.min_lr = float(t.get("min_lr", 0.0))

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._forward_logits = jax.jit(self._forward_logits_impl)
        # metrics + grid decode in ONE dispatch (per-call overhead is tens of
        # ms on tunneled TPUs; see gen_engine._sample_and_decode)
        self._eval_fused = jax.jit(self._eval_fused_impl)

    # ------------------------------------------------------------------ setup
    def init_state(self, steps_per_epoch: int, world_batch: int) -> TrainState:
        t = self.cfg.train
        lr = t.get("lr")
        if lr is None:
            lr = scale_base_lr(float(t.blr), world_batch, int(t.get("accum_iter", 1)), 1)
        self.lr_schedule = warmup_cosine_schedule(
            lr, self.min_lr, self.warmup_epochs, self.epochs, steps_per_epoch
        )
        rng = jax.random.PRNGKey(self.seed)
        pc = jnp.zeros((1, self.num_samples, 3), jnp.float32)
        queries = jnp.zeros((1, 64, 3), jnp.float32)
        variables = self.model.init(
            {"params": rng, "latent": jax.random.fold_in(rng, 1)}, pc, queries
        )
        state = create_train_state(
            variables["params"], self.lr_schedule, clip_grad=self.clip_grad,
            skip_nonfinite=self.skip_nonfinite, accum_iter=self.accum_iter,
        )
        # commit the state replicated over the mesh: keeps jit shardings
        # unambiguous and makes checkpoints restore to the same placement
        from rald_tpu.parallel.mesh import replicated

        return jax.device_put(state, replicated(self.mesh))

    def param_count(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    # ------------------------------------------------------------- train step
    def _loss_and_metrics(self, params, batch, rng, deterministic, model=None):
        model = self.model if model is None else model
        rngs = {"latent": jax.random.fold_in(rng, 0), "dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(
            {"params": params},
            batch["lidar_points"],
            batch["query_points"],
            rngs=rngs,
            deterministic=deterministic,
        )
        logits = out["logits"]
        labels = batch["query_labels"].astype(jnp.float32)
        k = self.in_voxel_num
        loss_vol = bce_with_logits(logits[:, :k], labels[:, :k])
        loss_near = bce_with_logits(logits[:, k:], labels[:, k:])
        loss_kl = jnp.mean(out["kl"])
        loss = self.vol_weight * loss_vol + self.near_weight * loss_near + self.kl_weight * loss_kl
        metrics = {
            "loss": loss,
            "loss_vol": loss_vol,
            "loss_near": loss_near,
            "loss_kl": loss_kl,
            **occupancy_metrics(logits, labels),
        }
        return loss, metrics

    def _train_step_impl(self, state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(
            lambda p: self._loss_and_metrics(p, batch, rng, deterministic=False), has_aux=True
        )
        (_, metrics), grads = grad_fn(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads, self.ema_rate)
        return state, metrics

    def _eval_step_impl(self, params, batch, rng):
        _, metrics = self._loss_and_metrics(
            params, batch, rng, deterministic=True, model=self.model_eval
        )
        return metrics

    def _eval_fused_impl(self, params, batch, grid, rng):
        _, metrics = self._loss_and_metrics(
            params, batch, rng, deterministic=True, model=self.model_eval
        )
        grid_logits = self._forward_logits_impl(
            params, batch["lidar_points"], grid, jax.random.fold_in(rng, 5)
        )
        return metrics, grid_logits

    def _forward_logits_impl(self, params, surface, queries, rng):
        out = self.model_eval.apply(
            {"params": params}, surface, queries, rngs={"latent": rng}, deterministic=True
        )
        return out["logits"]

    # ------------------------------------------------------------ epoch loops
    def train_one_epoch(
        self, state: TrainState, loader, epoch: int, log_writer=None, print_fn=print
    ):
        logger = MetricLogger(print_fn=print_fn)
        header = f"Epoch: [{epoch}]"
        base_rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        steps = len(loader)
        for it, batch in enumerate(logger.log_every(iter(loader), 20, header)):
            step_rng = jax.random.fold_in(base_rng, it)
            device_batch = shard_batch(
                {k: batch[k] for k in ("lidar_points", "query_points", "query_labels")},
                self.mesh,
            )
            state, metrics = self._train_step(state, device_batch, step_rng)
            host = {k: float(v) for k, v in metrics.items()}
            if not math.isfinite(host["loss"]):
                if self.skip_nonfinite:
                    print_fn(f"WARNING: non-finite loss {host['loss']} — update skipped")
                else:
                    print_fn(f"Loss is {host['loss']}, stopping training")
                    sys.exit(1)
            lr = float(self.lr_schedule(epoch * steps + it))
            logger.update(lr=lr, **host)
            if log_writer is not None:
                from rald_tpu.train.metrics import epoch_1000x

                x = epoch_1000x(it / max(steps, 1) + epoch)
                for tag, val in (
                    ("loss", host["loss"]), ("vol_loss", host["loss_vol"]),
                    ("near_loss", host["loss_near"]), ("kl_loss", host["loss_kl"]),
                    ("iou", host["iou"]), ("accuracy", host["accuracy"]), ("lr", lr),
                    ("norm", host["grad_norm"]),
                ):
                    log_writer.add_scalar(tag, val, x)
        logger.synchronize_between_processes()
        print_fn(f"Averaged stats: {logger}")
        return state, logger.averages()

    def evaluate(self, state: TrainState, loader, use_ema: bool = False, print_fn=print):
        """Reference engine_ae.evaluate (:157-290)."""
        cfg = self.cfg
        params = state.ema_params if use_ema else state.params
        print_fn(f"Using {'EMA' if use_ema else 'model'} parameters for evaluation")
        logger = MetricLogger(print_fn=print_fn)
        eval_freq = int(cfg.get("eval", {}).get("freq", 1) or 1)
        skip_cd = bool(cfg.get("eval", {}).get("iou_test_onlytest", False))
        num_query = int(
            cfg.get("eval", {}).get("inference", {}).get("num_query_points", 500000)
        )
        lidar = cfg.dataset.lidar
        rng = np.random.default_rng(self.seed)
        base_rng = jax.random.PRNGKey(self.seed + 7)

        for it, batch in enumerate(logger.log_every(iter(loader), 50, "Test:")):
            if it % eval_freq != 0:
                continue
            device_batch = shard_batch(
                {k: batch[k] for k in ("lidar_points", "query_points", "query_labels")},
                self.mesh,
            )
            if skip_cd:
                metrics = self._eval_step(params, device_batch, jax.random.fold_in(base_rng, it))
                logger.update(**{k: float(v) for k, v in metrics.items()})
                continue
            surface = batch["lidar_points"]
            bsz = surface.shape[0]
            # reference engine_ae.py:229-236
            grid = build_query_grid(
                lidar, num_query, bool(cfg.get("eval", {}).get("use_cart_query", False)), rng
            )
            grid_b = np.ascontiguousarray(np.broadcast_to(grid, (bsz, num_query, 3)))
            metrics, logits = self._eval_fused(
                params, device_batch, shard_batch(grid_b, self.mesh),
                jax.random.fold_in(base_rng, it),
            )
            logger.update(**{k: float(v) for k, v in metrics.items()})
            logits = np.asarray(logits)
            preds_xyz, gts_xyz = [], []
            for i in range(bsz):
                pos = grid[logits[i] > 0]
                pred = geo.inverse_norm_points(pos, lidar.pc_range, lidar.norm_anisotropy, lidar.norm_isotropy)
                gt = geo.inverse_norm_points(
                    surface[i], lidar.pc_range, lidar.norm_anisotropy, lidar.norm_isotropy
                )
                if lidar.get("view_cone_mode", False):
                    pred = geo.polar2cartesian(pred) if len(pred) else pred.reshape(0, 3)
                    gt = geo.polar2cartesian(gt)
                preds_xyz.append(pred)
                gts_xyz.append(gt)
            # ONE batched Chamfer/F-score dispatch per eval batch (the
            # per-frame variant costs a dispatch + sync each)
            cds, fscores = chamfer_and_fscore_batch(preds_xyz, gts_xyz, self.fscore_tau)
            logger.update(cd=float(np.mean(cds)), fscore=float(np.mean(fscores)))

        logger.synchronize_between_processes()
        stats = logger.averages()
        print_fn(
            "* iou {iou:.3f} loss {loss:.3f} cd {cd:.3f} fscore {f:.3f}".format(
                iou=stats.get("iou", 0.0), loss=stats.get("loss", 0.0),
                cd=stats.get("cd", -1.0), f=stats.get("fscore", -1.0),
            )
        )
        return stats
