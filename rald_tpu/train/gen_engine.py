"""Stage-2 diffusion training/eval engine — the product path.

Capability parity with ``engine_generation.py``:

- train (:42-136): frozen-VAE latent encode (or disk-cached latents,
  :74-83), optional frozen external radar encoder (:85-87), EDM loss (:93),
  clip + AdamW + EMA(0.999), NaN abort.
- evaluate (:138-355): EDM-sample latent tokens conditioned on the radar
  cube, decode occupancy at the eval query set (loss/IoU), then at a fresh
  uniform grid (+ CFAR helper points, ``query_helper``), threshold 0 ->
  point cloud, optional refine pass (re-query jittered points around
  positives, :292-310), polar->cartesian, Chamfer; ``test_sample_speed``
  short-circuits metrics (:224-236); ``store_latent``/``store_pc`` dumps
  (.npz latents / .ply clouds); ``use_pred_latent`` skips sampling.
- cache_latents (:357-413): frozen-VAE latents for the train split ->
  per-frame ``.npz`` keyed by sequence/frame.

TPU re-design:
- the sampling chain (35-NFE Heun scan + condition tokens computed once) and
  the streaming query decode are each one jitted program; train step is one
  jitted fused update like the AE engine.
- eval decodes a *static* query count per frame (grid + helper cap) so one
  compiled program serves every frame.
"""
from __future__ import annotations

import math
import sys
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rald_tpu import geometry as geo
from rald_tpu.data.query import aug_query_helper
from rald_tpu.diffusion.edm import edm_loss, edm_sampler, sample_prior_latents
from rald_tpu.eval.chamfer import chamfer_and_fscore_batch
from rald_tpu.eval.occupancy import occupancy_metrics
from rald_tpu.eval.ply import write_ply
from rald_tpu.eval.queries import build_query_grid
from rald_tpu.models.registry import get_ae_model, get_generation_model, get_radar_encoder_model
from rald_tpu.parallel.mesh import make_mesh, shard_batch
from rald_tpu.train.metrics import MetricLogger
from rald_tpu.train.schedule import scale_base_lr, warmup_cosine_schedule
from rald_tpu.train.state import TrainState, cast_tree_bf16, create_train_state


def bce_with_logits(logits, labels, mask=None):
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    if mask is None:
        return jnp.mean(bce)
    mask = mask.astype(bce.dtype)
    return jnp.sum(bce * mask) / (jnp.sum(mask) + 1e-5)


class GenerationEngine:
    def __init__(self, cfg, mesh=None, seed: Optional[int] = None, dtype=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = int(cfg.system.get("seed", 0) if seed is None else seed)
        if dtype is None:
            dtype = jnp.dtype(cfg.system.get("compute_dtype", "float32"))
        self.dtype = dtype

        mc = cfg.ar_model.configs
        self.model = get_generation_model(cfg.ar_model.name, mc, dtype=dtype)
        overrides = cfg.ar_model.get("overrides")
        if overrides:
            self.model = self.model.copy(**overrides)
        self.use_radar_cond = bool(mc.get("use_radar_cond", True))
        self.frozen_radar_enc = bool(mc.get("use_radar_enc", True)) and not bool(
            mc.get("unfreeze_radar_enc", False)
        )

        lidar = cfg.dataset.lidar
        self.num_samples = int(lidar.num_samples)
        self.use_cache_latent = bool(cfg.train.get("use_cache_latent", False))
        self.vae = get_ae_model(cfg.lidar_ae.name, N=self.num_samples, dtype=dtype)
        vae_overrides = cfg.lidar_ae.get("overrides")
        if vae_overrides:
            self.vae = self.vae.copy(**vae_overrides)
        self.latent_std = float(cfg.lidar_ae.get("latent_std", 1.0))

        # eval-only fast paths (system.fast_inference, default on): the folded
        # decode tail everywhere, the Pallas fused GEGLU FF on TPU only
        # (inference-only kernel, no autodiff rule — training keeps the
        # unfused modules). Same parameter trees; measured in docs/DESIGN.md.
        fast = bool(cfg.system.get("fast_inference", True))
        on_tpu = jax.default_backend() == "tpu"
        # quantized inference (eval.inference.int8_ff, default off): the DiT
        # FF matmuls run int8 (static per-column weight scales) on the MXU's
        # double-rate 8-bit mode. Activation scales: True = dynamic
        # per-token (no calibration needed), "static" = calibrated
        # per-(schedule-step, block) scales loaded from
        # eval.inference.int8_act_scales (npz written by
        # scripts/calibrate_int8.py; drops the per-token max reductions
        # from the kernel's VPU chain). Lossy — strictly opt-in, gated by
        # scripts/int8_gate.py.
        _inf = cfg.get("eval", {}).get("inference", {})
        int8_ff = _inf.get("int8_ff", False)
        if int8_ff not in (False, True, "static"):
            raise ValueError(
                f"eval.inference.int8_ff must be bool or 'static', got {int8_ff!r}"
            )
        self._act_scales = None
        if int8_ff == "static":
            self._act_scales = self._load_act_scales(_inf)
        # False | True/"full" | "vout" (v/out projections only — q/k stay
        # bf16; half the speedup, no softmax error amplification)
        int8_attn = _inf.get("int8_attn", False)
        if isinstance(int8_attn, str) and int8_attn not in ("full", "vout"):
            raise ValueError(
                f"eval.inference.int8_attn must be bool, 'full' or 'vout', "
                f"got {int8_attn!r}"
            )
        self.model_eval = (
            self.model.copy(
                use_fused_ff=True, use_int8_ff=int8_ff, use_int8_attn=int8_attn
            )
            if (fast and on_tpu) else self.model
        )
        self.vae_eval = (
            self.vae.copy(fold_decode_tail=True, use_fused_ff=on_tpu)
            if fast else self.vae
        )

        radar = cfg.dataset.get("radar", {})
        # on-device bilinear upsample of the conditioning cube: ship the raw
        # (R, A, E, C) cube (32x smaller) and resize inside the jitted step
        # instead of in the host pipeline (reference upsamples on the CPU,
        # Coloradar_dataset.py:455-470)
        self.upsample_on_device = bool(radar.get("upsample", False)) and bool(
            radar.get("upsample_on_device", False)
        )
        self._upsample_tgt = (
            int(radar.get("tgt_a_dim", 0) or 0),
            int(radar.get("tgt_e_dim", 0) or 0),
        )

        self.radar_enc = None
        if self.frozen_radar_enc:
            self.radar_enc = get_radar_encoder_model(
                cfg.radar_enc.name, in_channels=1, dtype=dtype
            )
            enc_overrides = cfg.radar_enc.get("overrides")
            if enc_overrides:
                self.radar_enc = self.radar_enc.copy(**enc_overrides)

        # sampler hyperparameters (reference hardcodes them, :235-239)
        inf = cfg.get("eval", {}).get("inference", {})
        self.sampler_kwargs = dict(
            num_steps=int(inf.get("num_steps", 18)),
            sigma_min=float(inf.get("sigma_min", 0.002)),
            sigma_max=float(inf.get("sigma_max", 80.0)),
            rho=float(inf.get("rho", 7.0)),
            s_churn=float(inf.get("s_churn", 0.0)),
            s_min=float(inf.get("s_min", 0.0)),
            s_max=float(inf.get("s_max", float("inf"))),
            s_noise=float(inf.get("s_noise", 1.0)),
        )

        self.shard_queries = bool(inf.get("shard_queries", False))
        # F-score distance threshold in metres (paper metric; extension —
        # the reference computes only Chamfer)
        self.fscore_tau = float(cfg.get("eval", {}).get("fscore_tau", 0.1))
        # in-graph Chamfer backend for the fused eval step (Pallas kernel on
        # TPU, vmapped scan elsewhere) — decided once, outside jit
        self._chamfer_pallas = on_tpu

        t = cfg.train
        self.ema_rate = 0.999
        self.clip_grad = float(t.get("clip_grad", 0) or 0)
        self.skip_nonfinite = bool(t.get("skip_nonfinite_updates", False))
        self.accum_iter = int(t.get("accum_iter", 1) or 1)
        self.epochs = int(t.epochs)
        self.warmup_epochs = float(t.get("warmup_epochs", 0))
        self.min_lr = float(t.get("min_lr", 0.0))

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._sample = jax.jit(self._sample_impl)
        self._decode = jax.jit(self._decode_impl)
        # threshold-only decode for the refine pass: bool readback is 4x
        # smaller over the tunnel than the f32 logits nobody looks at
        self._decode_hits = jax.jit(
            lambda vp, t, q: self._decode_impl(vp, t, q) > 0
        )
        self._vae_encode = jax.jit(self._vae_encode_impl)
        self._radar_encode = jax.jit(self._radar_encode_impl)
        # the whole eval chain in ONE dispatch: host->device call overhead is
        # tens of ms per jit call on tunneled TPUs, and the reference path
        # (sample, then decode eval queries, then decode the grid) costs 3+
        self._sample_and_decode = jax.jit(self._sample_and_decode_impl)
        # loss/IoU/accuracy in ONE dispatch: these ran as eager jnp ops —
        # ~20 primitive dispatches per eval batch, each paying the tunnel
        self._eval_metrics = jax.jit(self._eval_metrics_impl, static_argnames=("has_mask",))
        # the ENTIRE eval step as one program: sample + decode + grid
        # generation + helper densify + refine resample + Chamfer/F-score,
        # scalars-only readback. The round-5 stage attribution
        # (docs/artifacts/product_eval_attrib.json) put ~80% of the warm
        # product-eval wall in tunnel transfers (67 MB helper upload,
        # 48 MB refine upload, 27 MB Chamfer upload, 9.6 MB hits readback
        # per batch-8 step at ~35 MB/s) — this program moves all of it
        # on-device.
        self._fused_eval = jax.jit(
            self._fused_eval_step_impl,
            static_argnames=(
                "has_mask", "compute_cd", "refine", "helper_aug", "use_device_grid",
            ),
        )

    def _load_act_scales(self, inf_cfg) -> jax.Array:
        """Load calibrated FF activation scales for ``int8_ff: "static"``.

        Path: ``eval.inference.int8_act_scales``, default
        ``<eval.ckpt>/int8_act_scales.npz`` (written next to the checkpoint
        by scripts/calibrate_int8.py). Returns a (num_steps, depth, 2) f32
        table of (ah, ag) amax values, indexed by schedule step like the
        stacked AdaLN mod table.
        """
        path = str(inf_cfg.get("int8_act_scales", "") or "")
        if not path:
            ckpt = str(self.cfg.get("eval", {}).get("ckpt", "") or "")
            if not ckpt:
                raise ValueError(
                    "eval.inference.int8_ff: 'static' needs calibrated "
                    "activation scales — set eval.inference.int8_act_scales "
                    "or eval.ckpt (default <ckpt>/int8_act_scales.npz); run "
                    "scripts/calibrate_int8.py to produce them"
                )
            path = str(Path(ckpt) / "int8_act_scales.npz")
        if not Path(path).exists():
            raise FileNotFoundError(
                f"int8_ff: 'static' — no activation scales at {path}; run "
                "scripts/calibrate_int8.py on the eval checkpoint first"
            )
        with np.load(path) as z:
            ah, ag = np.asarray(z["ah"], np.float32), np.asarray(z["ag"], np.float32)
            calib_steps = int(z["num_steps"]) if "num_steps" in z else ah.shape[0]
        num_steps = int(inf_cfg.get("num_steps", 18))
        if ah.shape != ag.shape or ah.shape[0] != num_steps or calib_steps != num_steps:
            raise ValueError(
                f"activation scales at {path} were calibrated for "
                f"num_steps={calib_steps} (ah {ah.shape}), but "
                f"eval.inference.num_steps={num_steps} — recalibrate"
            )
        depth = int(self.model.depth)
        if ah.shape[1] != depth:
            raise ValueError(
                f"activation scales at {path} cover {ah.shape[1]} blocks, "
                f"model has depth {depth} — recalibrate"
            )
        return jnp.stack([jnp.asarray(ah), jnp.asarray(ag)], axis=-1)  # (S, depth, 2)

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
        x = jnp.zeros((1, self.model.n_latents, self.model.channels), jnp.float32)
        sigma = jnp.ones((1,))
        cube = self._dummy_cond()
        variables = self.model.init(rng, x, sigma, cube)
        state = create_train_state(
            variables["params"], self.lr_schedule, clip_grad=self.clip_grad,
            skip_nonfinite=self.skip_nonfinite, accum_iter=self.accum_iter,
        )
        from rald_tpu.parallel.mesh import replicated

        return jax.device_put(state, replicated(self.mesh))

    def _dummy_cond(self):
        if not self.use_radar_cond:
            return None
        mc = self.cfg.ar_model.configs
        if self.model.unfreeze_radar_enc or not self.model.use_radar_enc:
            r = self.cfg.dataset.radar
            if r.get("upsample", False):
                shape = (int(r.tgt_r_dim), int(r.tgt_a_dim), int(r.tgt_e_dim))
            else:
                shape = (int(r.input_r_dim), int(r.input_a_dim), int(r.input_e_dim))
            ch = int(r.get("input_ch", 3))
        else:
            shape = tuple(int(d) for d in self.model.enc_radar_dims)
            ch = int(mc.get("enc_radar_ch", 16))
        return jnp.zeros((1, *shape, ch), jnp.float32)

    def init_vae_params(self, rng=None):
        rng = jax.random.PRNGKey(self.seed + 1) if rng is None else rng
        pc = jnp.zeros((1, self.num_samples, 3), jnp.float32)
        queries = jnp.zeros((1, 64, 3), jnp.float32)
        return self.vae.init({"params": rng, "latent": jax.random.fold_in(rng, 1)}, pc, queries)[
            "params"
        ]

    def init_radar_enc_params(self, rng=None):
        assert self.radar_enc is not None
        rng = jax.random.PRNGKey(self.seed + 2) if rng is None else rng
        return self.radar_enc.init(rng, self._dummy_raw_cube())["params"]

    def _dummy_raw_cube(self):
        r = self.cfg.dataset.radar
        if r.get("upsample", False):
            shape = (int(r.tgt_r_dim), int(r.tgt_a_dim), int(r.tgt_e_dim))
        else:
            shape = (int(r.input_r_dim), int(r.input_a_dim), int(r.input_e_dim))
        return jnp.zeros((1, *shape, 1), jnp.float32)

    def param_count(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    def compiled_program_counts(self) -> dict:
        """Distinct XLA programs compiled per entry point so far (jit cache
        specializations). The compile budget of the product eval recipe is
        owned by this accounting: tests pin the total for the full recipe
        (tests/test_generation.py), scripts/product_eval_bench.py records it
        in the artifact. Module-level jits the eval loop reaches (batched
        Chamfer) are included."""
        from rald_tpu.eval import chamfer

        fns = {
            "train_step": self._train_step,
            "sample": self._sample,
            "decode": self._decode,
            "decode_hits": self._decode_hits,
            "vae_encode": self._vae_encode,
            "radar_encode": self._radar_encode,
            "sample_and_decode": self._sample_and_decode,
            "eval_metrics": self._eval_metrics,
            "fused_eval": self._fused_eval,
            "chamfer_batched": chamfer._batched_cd_fscore,
            "chamfer_per_frame": chamfer.masked_chamfer_fscore,
            "chamfer_nn": chamfer.nearest_neighbor_dists,
        }
        out = {}
        for name, fn in fns.items():
            try:
                out[name] = int(fn._cache_size())
            except AttributeError:  # monkeypatched in tests / plain callable
                out[name] = -1
        out["total"] = sum(v for v in out.values() if v > 0)
        return out

    # ----------------------------------------------------------------- pieces
    def _maybe_upsample(self, radar_cube):
        if radar_cube is None or not self.upsample_on_device:
            return radar_cube
        from rald_tpu.dsp.cfar_points import resize_linear_align_corners

        tgt_a, tgt_e = self._upsample_tgt
        return resize_linear_align_corners(radar_cube, (tgt_a, tgt_e), axes=(2, 3))

    def _vae_encode_impl(self, vae_params, pc, rng):
        _, z = self.vae.apply(
            {"params": vae_params}, pc, rng=rng, sample_posterior=True, method="encode"
        )
        return z.astype(jnp.float32) / self.latent_std

    def _radar_encode_impl(self, enc_params, cube):
        # frozen external encoder on the intensity channel (engine_generation.py:85-87)
        cube = self._maybe_upsample(cube)
        z = self.radar_enc.apply({"params": enc_params}, cube[..., :1], method="encode")
        return z

    def _train_step_impl(self, state: TrainState, latents, radar_cube, rng):
        if not self.frozen_radar_enc:
            radar_cube = self._maybe_upsample(radar_cube)

        def loss_fn(params):
            def denoise(x, sigma):
                return self.model.apply(
                    {"params": params}, x, sigma, radar_cube, deterministic=False
                )

            return edm_loss(denoise, rng, latents)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        state = state.apply_gradients(grads, self.ema_rate)
        return state, metrics

    def _sample_impl(self, params, radar_cube, seeds, capture_states=False):
        """model.sample (reference :435-449): prior draw + Heun scan.

        Condition tokens are processed ONCE here, then reused for all NFEs.
        ``capture_states`` additionally returns every (schedule_index,
        state) pair the denoiser saw (diffusion.edm.edm_sampler) — the
        replay inputs for activation-scale calibration.
        """
        model = self.model_eval
        variables = {"params": params}
        int8 = {}
        if getattr(model, "use_int8_ff", False):
            # quantize the FF weights once per sampling call — this sits
            # outside the NFE scan, so the 35-NFE loop reads the int8
            # weights straight from HBM at half the bf16 byte volume
            from rald_tpu.ops.geglu_kernel import quantize_ff_tree

            int8 = quantize_ff_tree(params)
        if getattr(model, "use_int8_attn", False):
            from rald_tpu.ops.attn_kernel import merge_int8_trees, quantize_attn_tree

            int8 = merge_int8_trees(int8, quantize_attn_tree(params))
        if int8:
            variables = {"params": params, "int8": int8}
        cond = None
        if radar_cube is not None:
            if not self.frozen_radar_enc:
                radar_cube = self._maybe_upsample(radar_cube)
            cond = model.apply(variables, radar_cube, method="process_radar_cond")
        latents = sample_prior_latents(seeds, model.n_latents, model.channels)

        if self.sampler_kwargs.get("s_churn", 0) > 0:
            # churn perturbs sigma off the schedule — mod tables don't
            # apply, and neither do per-step static activation scales (the
            # int8 FF silently falls back to dynamic per-token scales:
            # denoise() passes no act_scales)
            def denoise(x, sigma):
                return model.apply(variables, x, sigma, cond, method="denoise")

            from rald_tpu.diffusion.edm import per_sample_keys

            noise_keys = per_sample_keys(seeds)
            return edm_sampler(
                denoise, latents, noise_keys=noise_keys,
                capture_states=capture_states, **self.sampler_kwargs,
            )

        # churn-free: sigmas stay on the schedule, so every AdaLN modulation
        # is precomputable — one batched projection pass instead of 3*depth
        # tiny gemms inside each of the 35 NFEs (measured ~8% per frame at
        # batch 1 and -2% at batch 8, round-2 probe)
        from rald_tpu.diffusion.edm import karras_sigmas

        t_steps = karras_sigmas(
            self.sampler_kwargs["num_steps"],
            self.sampler_kwargs["sigma_min"],
            self.sampler_kwargs["sigma_max"],
            self.sampler_kwargs["rho"],
        )
        from rald_tpu.diffusion.edm import stack_mod_table, unstack_mods

        mod_table = stack_mod_table(model.apply(
            variables, t_steps[:-1], method="compute_mod_table"
        ))

        act_table = self._act_scales if getattr(model, "use_int8_ff", False) == "static" else None

        def denoise_indexed(x, sigma, idx):
            # one dynamic slice per NFE on the stacked table (vs one per leaf)
            mods = unstack_mods(mod_table[idx])
            sc = None
            if act_table is not None:
                row = act_table[idx]  # (depth, 2) — same one-slice trick
                sc = tuple((row[i, 0], row[i, 1]) for i in range(row.shape[0]))
            return model.apply(
                variables, x, sigma, mods, cond, method="denoise_with_mods",
                act_scales=sc,
            )

        return edm_sampler(
            lambda x, s: None, latents, denoise_indexed=denoise_indexed,
            capture_states=capture_states, **self.sampler_kwargs,
        )

    def _decode_impl(self, vae_params, tokens, queries):
        out = self.vae_eval.apply({"params": vae_params}, tokens, queries, method="decode")
        return jnp.squeeze(out, -1)

    def _densify_helper_host(self, helper, helper_mask, rng_np):
        """Host aug_query_helper over raw bucket-padded CFAR points — the
        modular (dump-mode) twin of the fused path's in-graph densify."""
        lidar = self.cfg.dataset.lidar
        aniso, iso = lidar.norm_anisotropy, lidar.norm_isotropy
        aug_num = int(float(self.cfg.dataset.get("query_aug_num", 0)))
        scale = int(self.cfg.dataset.get("query_aug_scale", 2))
        dense = np.zeros((helper.shape[0], aug_num, 3), np.float32)
        for i in range(helper.shape[0]):
            raw = helper[i][helper_mask[i]]
            if not len(raw):  # no CFAR points in frame: nothing to densify
                continue
            raw_un = geo.inverse_norm_points(raw, lidar.pc_range, aniso, iso)
            dense[i] = geo.norm_points(
                aug_query_helper(
                    raw_un.astype(np.float32), aug_num, lidar.pc_range,
                    lidar.voxel_size, scale, rng_np,
                ),
                lidar.pc_range, aniso, iso,
            ).astype(np.float32)
        return dense

    def _eval_metrics_impl(self, logits, labels, mask, has_mask=True):
        m = mask if has_mask else None
        loss = bce_with_logits(logits, labels, m)
        om = occupancy_metrics(logits, labels, mask=m)
        return loss, om["iou"], om["accuracy"]

    def _sample_and_decode_impl(self, params, vae_params, radar_cube, seeds, q_eval, grid, helper):
        """sample -> decode(eval queries) -> decode(grid [+ helper]) in one jit.

        ``grid``: ONE (Q, 3) random grid shared by every frame of the batch,
        broadcast on DEVICE — the host-duplicated per-frame grid was ~100 MB
        of host->device traffic per batch-8 eval step on the tunneled TPU
        (profiled: device_put was ~40% of the warm product-eval wall).
        ``helper``: optional per-frame (B, H, 3) CFAR helper points,
        concatenated after the grid. Grid occupancy comes back as BOOLEAN
        hits — the eval loop only ever thresholds it, and the bool readback
        is 4x smaller. Query-axis padding for ``shard_queries`` also moved
        in here (static shapes — free at trace time)."""
        tokens = self._sample_impl(params, radar_cube, seeds)
        logits_eval = self._decode_impl(vae_params, tokens, q_eval)
        bsz = q_eval.shape[0]
        q_grid = jnp.broadcast_to(grid[None].astype(jnp.float32), (bsz,) + grid.shape)
        if helper is not None:
            q_grid = jnp.concatenate([q_grid, helper.astype(q_grid.dtype)], axis=1)
        n_true = q_grid.shape[1]
        if self.shard_queries:
            n_dev = self.mesh.devices.size
            pad = (-n_true) % n_dev
            if pad:  # duplicate-pad for even query shards; trimmed below
                q_grid = jnp.concatenate([q_grid, q_grid[:, :pad]], axis=1)
            logits_grid = self._decode_query_sharded(vae_params, tokens, q_grid)
            logits_grid = logits_grid[:, :n_true]
        else:
            logits_grid = self._decode_impl(vae_params, tokens, q_grid)
        return tokens, logits_eval, logits_grid > 0

    def _fused_eval_step_impl(
        self,
        params,
        vae_params,
        radar_cube,
        seeds,
        q_eval,
        labels,
        qmask,
        grid,
        batch_key,
        helper,
        helper_mask,
        surface,
        surface_mask,
        has_mask: bool = False,
        compute_cd: bool = True,
        refine: bool = True,
        helper_aug: bool = False,
        use_device_grid: bool = True,
    ):
        """One program for the whole eval step (reference
        engine_generation.py:138-310 semantics): sample -> decode eval
        queries (loss/IoU/acc) -> decode [grid ; densified helper] ->
        threshold -> refine resample + decode -> Chamfer + F-score@tau.

        Only scalars (and (B,) metric vectors) leave the device. ``grid`` is
        a host array only for ``use_cart_query`` (rejection sampling is
        host-side); otherwise it is generated in-graph from ``batch_key``.
        ``helper_aug`` densifies RAW CFAR helper points in-graph
        (``dataset.helper_aug_on_device``); with pre-densified host helpers
        it concatenates them as-is.
        """
        from rald_tpu.eval.chamfer import batched_cd_fscore_graph
        from rald_tpu.eval.densify import densify_queries

        inference = self.cfg.get("eval", {}).get("inference", {})
        lidar = self.cfg.dataset.lidar
        aniso = bool(lidar.norm_anisotropy)
        iso = bool(lidar.norm_isotropy)
        num_query = int(inference.get("num_query_points", 500000))
        k_grid, k_helper, k_refine = jax.random.split(batch_key, 3)

        if use_device_grid:
            # uniform over the normalized box (eval/queries.py semantics)
            offset, scale = geo.norm_scale_offset(lidar.pc_range)
            if iso:
                lo = -(scale / scale.max())
                hi = scale / scale.max()
            else:
                lo, hi = -np.ones(3, np.float32), np.ones(3, np.float32)
            grid = jax.random.uniform(
                k_grid, (num_query, 3), minval=lo, maxval=hi, dtype=jnp.float32
            )

        if helper is not None and helper_aug:
            helper, _, _ = densify_queries(
                helper, helper_mask,
                int(float(self.cfg.dataset.get("query_aug_num", 0))),
                k_helper, lidar.pc_range, lidar.voxel_size,
                int(self.cfg.dataset.get("query_aug_scale", 2)), aniso, iso,
            )

        tokens, logits_eval, hits = self._sample_and_decode_impl(
            params, vae_params, radar_cube, seeds, q_eval, grid, helper
        )
        loss, iou, acc = self._eval_metrics_impl(logits_eval, labels, qmask, has_mask)

        bsz = q_eval.shape[0]
        q_grid = jnp.broadcast_to(grid[None].astype(jnp.float32), (bsz,) + grid.shape)
        if helper is not None:
            q_grid = jnp.concatenate([q_grid, helper.astype(q_grid.dtype)], axis=1)

        if refine:
            refine_n = int(float(inference.refine_query_aug_num))
            refined, valid, _ = densify_queries(
                q_grid, hits, refine_n, k_refine, lidar.pc_range,
                lidar.voxel_size, int(inference.refine_query_scale), aniso, iso,
            )
            hits2 = self._decode_impl(vae_params, tokens, refined) > 0
            pred_pts, pred_mask = refined, jnp.logical_and(hits2, valid)
        else:
            pred_pts, pred_mask = q_grid, hits
        n_pred = jnp.sum(pred_mask.astype(jnp.int32), axis=1)

        if not compute_cd:
            neg = jnp.full((bsz,), -1.0, jnp.float32)
            return loss, iou, acc, neg, neg, n_pred

        pred_un = geo.inverse_norm_points(pred_pts, lidar.pc_range, aniso, iso)
        gt_un = geo.inverse_norm_points(
            surface.astype(jnp.float32), lidar.pc_range, aniso, iso
        )
        if lidar.get("view_cone_mode", False):
            pred_un = geo.polar2cartesian(pred_un)
            gt_un = geo.polar2cartesian(gt_un)
        cd, f = batched_cd_fscore_graph(
            pred_un, pred_mask, gt_un, surface_mask,
            jnp.float32(self.fscore_tau), use_pallas=self._chamfer_pallas,
        )
        return loss, iou, acc, cd, f, n_pred

    def _decode_query_sharded(self, vae_params, tokens, queries):
        """Shard the query axis over the mesh's data axis (SURVEY §5.7:
        queries attend independently to the tokens, so inference decode is
        embarrassingly parallel over the mesh — our sequence parallelism).
        Query count must be a multiple of the mesh size (caller pads)."""
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            self._decode_impl,
            mesh=self.mesh,
            in_specs=(P(), P(), P(None, "data", None)),
            out_specs=P(None, "data"),
            check_vma=False,
        )
        return fn(vae_params, tokens, queries)

    def sample_tokens(self, params, radar_cube, seeds):
        return self._sample(params, radar_cube, seeds)

    def decode_queries(self, vae_params, tokens, queries):
        """Public decode for external drivers (cli/infer.py): query-sharded
        over the mesh when ``eval.inference.shard_queries`` is set (query
        count must then be a multiple of the mesh size), plain jit otherwise.
        """
        if self.shard_queries:
            return self._decode_query_sharded(vae_params, tokens, queries)
        return self._decode(vae_params, tokens, queries)

    def encode_radar(self, radar_enc_params, radar_cube):
        """Public frozen-encoder forward for external drivers."""
        return self._radar_encode(radar_enc_params, radar_cube)

    def calibrate_act_scales(
        self,
        state_or_params,
        loader,
        radar_enc_params=None,
        num_batches: int = 2,
        use_ema: bool = True,
        margin: float = 1.0,
        print_fn=print,
    ):
        """Calibrate the per-(schedule-step, block) FF activation amax tables
        consumed by ``eval.inference.int8_ff: "static"``.

        Protocol: run the engine's OWN sampler with ``capture_states`` on
        ``num_batches`` eval batches — so the calibration sees exactly the
        (schedule index, latent state) pairs the deployed sampler visits,
        including any int8 trajectory drift if the engine is already in a
        quantized mode — then replay each state through the UNFUSED
        full-precision denoiser with ``sow_quant_stats`` and reduce
        ``max |h|`` (post LN+AdaLN-mod FF input) / ``max |g|`` (gated
        product) per (step, block) over batches and tokens.

        Returns ``(ah, ag)`` f32 numpy arrays of shape (num_steps, depth),
        scaled by ``margin`` (activations beyond the calibrated amax
        saturate at eval time — int8 clip semantics).
        """
        from rald_tpu.diffusion.edm import karras_sigmas, stack_mod_table, unstack_mods

        if isinstance(state_or_params, TrainState):
            params = state_or_params.ema_params if use_ema else state_or_params.params
        else:
            params = state_or_params
        if self.sampler_kwargs.get("s_churn", 0) > 0:
            raise ValueError(
                "static activation scales are per-schedule-step; churn "
                "perturbs sigma off the schedule (int8_ff: 'static' is "
                "unsupported with s_churn > 0)"
            )
        calib_model = self.model.copy(
            use_fused_ff=False, use_fused_attn=False,
            use_int8_ff=False, use_int8_attn=False, sow_quant_stats=True,
        )
        depth = int(self.model.depth)
        num_steps = int(self.sampler_kwargs["num_steps"])
        t_steps = karras_sigmas(
            num_steps, self.sampler_kwargs["sigma_min"],
            self.sampler_kwargs["sigma_max"], self.sampler_kwargs["rho"],
        )

        capture = jax.jit(lambda p, rc, s: self._sample_impl(p, rc, s, capture_states=True))
        cond_fn = jax.jit(
            lambda p, rc: calib_model.apply({"params": p}, rc, method="process_radar_cond")
        )

        def _replay(p, x, idx, mod_table, cond):
            mods = unstack_mods(mod_table[idx])
            _, vs = calib_model.apply(
                {"params": p}, x, t_steps[idx], mods, cond,
                method="denoise_with_mods", mutable=["quant_stats"],
            )
            qs = vs["quant_stats"]["model"]
            h = jnp.stack([qs[f"block_{i}"]["ff"]["h_amax"][0] for i in range(depth)])
            g = jnp.stack([qs[f"block_{i}"]["ff"]["g_amax"][0] for i in range(depth)])
            return h, g

        replay = jax.jit(_replay)
        mod_table = stack_mod_table(
            calib_model.apply({"params": params}, t_steps[:-1], method="compute_mod_table")
        )

        amax_h = np.zeros((num_steps, depth), np.float32)
        amax_g = np.zeros((num_steps, depth), np.float32)
        batches = 0
        it = iter(loader)
        for b in range(num_batches):
            try:
                batch = next(it)
            except StopIteration:
                break
            bsz = int(np.asarray(batch["lidar_points"]).shape[0])
            radar_cube = cond = None
            if self.use_radar_cond:
                radar_cube = jax.device_put(batch["radar_cube"])
                if self.frozen_radar_enc:
                    radar_cube = self._radar_encode(radar_enc_params, radar_cube)
                    cond_in = radar_cube
                else:
                    cond_in = self._maybe_upsample(radar_cube)
                cond = cond_fn(params, cond_in)
            seeds = jnp.arange(b * bsz, (b + 1) * bsz)
            _, (idxs, xs) = capture(params, radar_cube, seeds)
            for k, idx in enumerate(np.asarray(jax.device_get(idxs))):
                h, g = replay(params, xs[k], idxs[k], mod_table, cond)
                amax_h[idx] = np.maximum(amax_h[idx], np.asarray(h))
                amax_g[idx] = np.maximum(amax_g[idx], np.asarray(g))
            batches += 1
            print_fn(f"calibrate_act_scales: batch {batches}/{num_batches} done")
        if not batches:
            raise ValueError("calibrate_act_scales: empty loader")
        return amax_h * margin, amax_g * margin

    # ------------------------------------------------------------ epoch loops
    def train_one_epoch(
        self,
        state: TrainState,
        loader,
        epoch: int,
        vae_params=None,
        radar_enc_params=None,
        log_writer=None,
        print_fn=print,
    ):
        logger = MetricLogger(print_fn=print_fn)
        header = f"Epoch: [{epoch}]"
        base_rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        steps = len(loader)
        for it, batch in enumerate(logger.log_every(iter(loader), 20, header)):
            step_rng = jax.random.fold_in(base_rng, it)
            latents, radar_cube = self._prepare_inputs(
                batch, vae_params, radar_enc_params, jax.random.fold_in(step_rng, 99)
            )
            state, metrics = self._train_step(state, latents, radar_cube, step_rng)
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
                log_writer.add_scalar("loss", host["loss"], x)
                log_writer.add_scalar("lr", lr, x)
                log_writer.add_scalar("norm", host["grad_norm"], x)
        logger.synchronize_between_processes()
        print_fn(f"Averaged stats: {logger}")
        return state, logger.averages()

    def _prepare_inputs(self, batch, vae_params, radar_enc_params, rng):
        if self.use_cache_latent:
            latents = jax.device_put(np.asarray(batch["cache_latent"], np.float32))
        else:
            assert vae_params is not None, "frozen VAE params required without latent cache"
            latents = self._vae_encode(vae_params, jax.device_put(batch["lidar_points"]), rng)
        radar_cube = None
        if self.use_radar_cond:
            radar_cube = jax.device_put(batch["radar_cube"])
            if self.frozen_radar_enc:
                assert radar_enc_params is not None, "frozen radar encoder params required"
                radar_cube = self._radar_encode(radar_enc_params, radar_cube)
        latents, radar_cube = shard_batch((latents, radar_cube), self.mesh)
        return latents, radar_cube

    def evaluate(
        self,
        state_or_params,
        loader,
        vae_params,
        radar_enc_params=None,
        use_ema: bool = False,
        print_fn=print,
        stage_timer=None,
    ):
        """Reference engine_generation.evaluate (:138-355).

        ``stage_timer``: optional :class:`rald_tpu.train.profiler.StageTimer`
        — attributes the eval wall to pipeline stages (profiling only; it
        serializes the host/device overlap it measures).
        """
        from rald_tpu.train.profiler import StageTimer

        st = stage_timer if stage_timer is not None else StageTimer(enabled=False)
        cfg = self.cfg
        if isinstance(state_or_params, TrainState):
            params = state_or_params.ema_params if use_ema else state_or_params.params
        else:
            params = state_or_params
        print_fn(f"Using {'EMA' if use_ema else 'model'} parameters for evaluation")
        ev = cfg.get("eval", {})
        if bool(ev.get("cast_params_bf16", False)):
            # inference-only bf16 weights (halves weight HBM re-reads; decode
            # -17% measured, docs/DESIGN.md). Default off: f32 params + bf16
            # compute is the parity-tested configuration.
            params = cast_tree_bf16(params)
            vae_params = cast_tree_bf16(vae_params)
            if radar_enc_params is not None:
                radar_enc_params = cast_tree_bf16(radar_enc_params)
        inference = ev.get("inference", {})
        eval_freq = int(ev.get("freq", 1) or 1)
        iou_test_only = bool(ev.get("iou_test_only", False))
        test_sample_speed = bool(ev.get("test_sample_speed", False))
        skip_metric = bool(ev.get("skip_eval_metric", False))
        use_pred_latent = bool(ev.get("use_pred_latent", False))
        store_latent = bool(ev.get("store_latent", False))
        store_pc = bool(ev.get("store_pc", False))
        num_query = int(inference.get("num_query_points", 500000))
        use_helper = bool(inference.get("query_helper", False))
        refine_query = bool(inference.get("refine_query", False))

        lidar = cfg.dataset.lidar
        aniso, iso = lidar.norm_anisotropy, lidar.norm_isotropy
        use_cart_query = bool(ev.get("use_cart_query", False))
        rng_np = np.random.default_rng(self.seed)
        eval_key = jax.random.PRNGKey(self.seed + 11)  # fused-path device RNG
        logger = MetricLogger(print_fn=print_fn)

        def make_grid():
            return build_query_grid(lidar, num_query, use_cart_query, rng_np)

        def timed_iter(src):
            src = iter(src)
            while True:
                with st("loader"):
                    try:
                        batch = next(src)
                    except StopIteration:
                        return
                yield batch

        for it, batch in enumerate(logger.log_every(timed_iter(loader), 20, "Test:")):
            if it % eval_freq != 0:
                continue
            surface = np.asarray(batch["lidar_points"])
            bsz = surface.shape[0]
            # bucket-padded ragged eval: real per-frame counts for GT slicing
            pts_num = np.asarray(batch.get("points_num", [surface.shape[1]] * bsz), np.int64)
            radar_cube = None
            if self.use_radar_cond:
                with st("radar_encode"):
                    radar_cube = jax.device_put(batch["radar_cube"])
                    if self.frozen_radar_enc:
                        radar_cube = st.block(self._radar_encode(radar_enc_params, radar_cube))

            fused = not (use_pred_latent or test_sample_speed or iou_test_only)
            # the one-program path: everything incl. refine + Chamfer stays
            # on device, only scalars come back. Dump modes need the clouds
            # host-side, so they take the modular path below.
            fused_all = fused and not (store_pc or store_latent)
            if fused_all:
                with st("make_grid"):
                    grid = make_grid() if use_cart_query else None
                helper = helper_mask = None
                if use_helper and "helper_points" in batch:
                    helper = jax.device_put(np.asarray(batch["helper_points"], np.float32))
                    if "helper_mask" in batch:  # raw CFAR points -> device aug
                        helper_mask = jax.device_put(
                            np.asarray(batch["helper_mask"], bool)
                        )
                labels_np = np.asarray(batch["query_labels"], np.float32)
                qmask_np = (
                    np.asarray(batch["query_mask"], np.float32)
                    if "query_mask" in batch else None
                )
                smask = np.arange(surface.shape[1])[None] < pts_num[:, None]
                with st("fused_eval_step"):
                    loss, iou, acc, cds, fs, _ = self._fused_eval(
                        params, vae_params, radar_cube,
                        jnp.arange(it * bsz, it * bsz + bsz),
                        jax.device_put(batch["query_points"]),
                        jax.device_put(labels_np),
                        jax.device_put(labels_np if qmask_np is None else qmask_np),
                        None if grid is None else jax.device_put(grid),
                        jax.random.fold_in(eval_key, it),
                        helper, helper_mask,
                        jax.device_put(surface), jax.device_put(smask),
                        has_mask=qmask_np is not None,
                        compute_cd=not skip_metric,
                        refine=refine_query,
                        helper_aug=helper_mask is not None,
                        use_device_grid=not use_cart_query,
                    )
                with st("metrics_readback"):
                    logger.update(
                        loss=float(loss), iou=float(iou), accuracy=float(acc)
                    )
                    if not skip_metric:
                        logger.update(
                            cd=float(np.mean(np.asarray(cds))),
                            fscore=float(np.mean(np.asarray(fs))),
                        )
                    else:
                        logger.update(cd=-1.0, fscore=-1.0)
                continue

            grid_hits = grid_b = helper = None
            if fused:
                # one dispatch per batch: sample + both decodes (per-call
                # host->device overhead is tens of ms on tunneled TPUs).
                # The shared grid is broadcast and the helper concatenated
                # ON DEVICE (see _sample_and_decode_impl); hits come back
                # as bools.
                with st("make_grid"):
                    grid = make_grid()
                if use_helper and "helper_points" in batch:
                    helper = np.asarray(batch["helper_points"], np.float32)
                    if "helper_mask" in batch:
                        # dataset shipped RAW CFAR points (helper_aug_on_device)
                        # but this dump-mode path runs modular: densify on host
                        helper = self._densify_helper_host(
                            helper, np.asarray(batch["helper_mask"], bool), rng_np
                        )
                with st("sample_decode"):
                    seeds = jnp.arange(it * bsz, it * bsz + bsz)
                    tokens, logits, grid_hits = self._sample_and_decode(
                        params, vae_params, radar_cube, seeds,
                        jax.device_put(batch["query_points"]),
                        jax.device_put(grid),
                        None if helper is None else jax.device_put(helper),
                    )
                with st("hits_readback"):
                    grid_hits = np.asarray(grid_hits)
            elif use_pred_latent:
                tokens = jax.device_put(np.asarray(batch["pred_latent"], np.float32))
                if tokens.ndim == 4:  # reference .pt latents carry (1, M, D) per frame
                    tokens = jnp.squeeze(tokens, 1)
            else:
                seeds = jnp.arange(it * bsz, it * bsz + bsz)
                tokens = self._sample(params, radar_cube, seeds)

            if store_latent and "lidar_path" in batch:
                base = Path(ev.store_base_dir) / ev.exp_name
                for i in range(bsz):
                    seq = Path(batch["lidar_path"][i]).parent.parent.name
                    d = base / seq / "latent_tokens"
                    d.mkdir(parents=True, exist_ok=True)
                    np.save(d / (Path(batch["radar_path"][i]).stem + ".npy"), np.asarray(tokens[i]))

            if test_sample_speed:
                jax.block_until_ready(tokens)
                logger.update(loss=-1.0, iou=-1.0)
                continue

            # loss/IoU on the eval query set (or the surface for iou_test_only;
            # reference computes these in BOTH modes, engine_generation.py:229-247,
            # and iou_test_only skips only the CD/grid block :249)
            if not fused:
                queries = jax.device_put(surface if iou_test_only else batch["query_points"])
                logits = self._decode(vae_params, tokens, queries)
            with st("eval_metrics"):
                labels = jax.device_put(batch["query_labels"]).astype(jnp.float32)
                qmask = None
                if iou_test_only and "lidar_mask" in batch:  # surface-query mode
                    qmask = jax.device_put(np.asarray(batch["lidar_mask"], np.float32))
                elif "query_mask" in batch:  # bucket-padded ragged eval
                    qmask = jax.device_put(np.asarray(batch["query_mask"], np.float32))
                loss, iou, acc = self._eval_metrics(
                    logits, labels, labels if qmask is None else qmask,
                    has_mask=qmask is not None,
                )
                logger.update(loss=float(loss), iou=float(iou), accuracy=float(acc))

            if iou_test_only:
                continue

            # uniform grid (+ helper points) -> thresholded point cloud -> CD
            if grid_hits is None:  # non-fused fallback (use_pred_latent)
                grid = make_grid()
                grid_b = np.broadcast_to(grid, (bsz, num_query, 3)).copy()
                if use_helper and "helper_points" in batch:
                    helper = np.asarray(batch["helper_points"], np.float32)
                    grid_b = np.concatenate([grid_b, helper], axis=1)
                grid_hits = np.asarray(
                    self._decode_hits(vae_params, tokens, jax.device_put(grid_b))
                )

            def frame_positives(i):
                """Host coordinates of frame i's hit queries (the fused path
                never materializes the per-frame grid copy)."""
                m = grid_hits[i]
                if grid_b is not None:
                    return grid_b[i][m]
                pos = grid[m[:num_query]]
                if helper is not None:
                    pos = np.concatenate([pos, helper[i][m[num_query:]]], axis=0)
                return pos

            # threshold the grid hits per frame, then run the refine decode
            # as ONE batched dispatch for the whole frame loop (a per-frame
            # batch-1 dispatch costs ~30 ms of tunnel overhead each on this
            # hardware; aug_query_helper's output count is fixed, so the
            # batch shape is static). The helper RNG is consumed in frame
            # order, matching the previous per-frame interleaving exactly.
            preds = []
            if refine_query:
                refine_n = int(float(inference.refine_query_aug_num))
                refined_norm = np.zeros((bsz, refine_n, 3), np.float32)
                do_refine = np.zeros(bsz, dtype=bool)
            for i in range(bsz):
                with st("threshold_invnorm"):
                    pos = frame_positives(i)
                    pred = geo.inverse_norm_points(pos, lidar.pc_range, aniso, iso)
                if refine_query and len(pred):
                    with st("refine_aug"):
                        refined = aug_query_helper(
                            pred,
                            refine_n,
                            lidar.pc_range,
                            lidar.voxel_size,
                            int(inference.refine_query_scale),
                            rng_np,
                        )
                        refined_norm[i] = geo.norm_points(
                            refined, lidar.pc_range, aniso, iso
                        ).astype(np.float32)
                        do_refine[i] = True
                preds.append(pred)
            if refine_query and do_refine.any():
                with st("refine_decode"):
                    r_hits = np.asarray(
                        self._decode_hits(vae_params, tokens, jax.device_put(refined_norm))
                    )
                with st("refine_post"):
                    for i in range(bsz):
                        if do_refine[i]:
                            preds[i] = geo.inverse_norm_points(
                                refined_norm[i][r_hits[i]], lidar.pc_range, aniso, iso
                            )

            preds_xyz, gts_xyz = [], []
            for i in range(bsz):
                pred = preds[i]
                with st("gt_prep"):
                    gt = geo.inverse_norm_points(
                        surface[i, : pts_num[i]], lidar.pc_range, aniso, iso
                    )
                    if lidar.get("view_cone_mode", False):
                        pred = geo.polar2cartesian(pred) if len(pred) else pred.reshape(0, 3)
                        gt = geo.polar2cartesian(gt)
                preds_xyz.append(pred)
                gts_xyz.append(gt)

                if store_pc and "radar_path" in batch:
                    seq = Path(batch["radar_path"][i]).parent.parent.parent.name
                    d = Path(ev.store_base_dir) / ev.exp_name / seq / ev.get(
                        "save_pc_dir_name", "pred_pc"
                    )
                    write_ply(d / (Path(batch["radar_path"][i]).stem + ".ply"), pred)
            if skip_metric:
                cds, fscores = [-1.0] * bsz, [-1.0] * bsz
            else:
                # F-score@tau rides the same NN passes as Chamfer (the paper
                # reports it; the reference code computes only CD). ONE
                # device dispatch for the whole batch — the per-frame
                # variant cost a dispatch + sync each (~30 ms of tunnel
                # overhead per frame) plus recompiles across pad buckets.
                with st("chamfer"):
                    cds, fscores = chamfer_and_fscore_batch(
                        preds_xyz, gts_xyz, self.fscore_tau
                    )
            logger.update(cd=float(np.mean(cds)), fscore=float(np.mean(fscores)))

        logger.synchronize_between_processes()
        stats = logger.averages()
        print_fn(
            "* iou {iou:.3f} loss {loss:.3f} cd {cd:.3f} fscore {f:.3f}".format(
                iou=stats.get("iou", -1.0), loss=stats.get("loss", -1.0),
                cd=stats.get("cd", -1.0), f=stats.get("fscore", -1.0),
            )
        )
        return stats

    # ------------------------------------------------------------ latent cache
    def cache_latents(self, vae_params, loader, cache_base_path, print_fn=print):
        """Reference cache_latents (engine_generation.py:357-413)."""
        cache_base_path = Path(cache_base_path)
        logger = MetricLogger(print_fn=print_fn)
        rng = jax.random.PRNGKey(self.seed + 3)
        for it, batch in enumerate(logger.log_every(iter(loader), 50, "Caching: ")):
            pcs = jax.device_put(batch["lidar_points"])
            z = self._vae_encode(vae_params, pcs, jax.random.fold_in(rng, it))
            logits = self._decode(vae_params, z, jax.device_put(batch["query_points"]))
            labels = jax.device_put(batch["query_labels"]).astype(jnp.float32)
            m = occupancy_metrics(logits, labels)
            logger.update(iou=float(m["iou"]))
            z_np = np.asarray(z)
            for i, lidar_path in enumerate(batch["lidar_path"]):
                p = Path(lidar_path)
                seq_name, frame_name = p.parts[-3], p.parts[-1]
                d = cache_base_path / seq_name
                d.mkdir(parents=True, exist_ok=True)
                np.savez(d / (frame_name + ".npz"), res_tokens=z_np[i])
        return logger.averages()
