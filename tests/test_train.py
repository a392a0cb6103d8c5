"""Training-stack tests: schedule oracle, state/EMA, checkpoint roundtrip,
multi-device sharded train step, and an end-to-end AE smoke train on the
synthetic dataset (8-way CPU mesh — SURVEY.md §4's multi-node answer)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rald_tpu.config import Config
from rald_tpu.train.schedule import scale_base_lr, warmup_cosine_schedule
from rald_tpu.train.state import create_train_state, ema_update
from rald_tpu.train.checkpoint import CheckpointManager
from rald_tpu.train.metrics import MetricLogger, SmoothedValue


class TestSchedule:
    def test_matches_reference_formula(self):
        """Oracle port of utils/lr_sched.py:9-21."""
        lr, min_lr, warmup, epochs, spe = 1e-3, 1e-6, 2.0, 10.0, 100
        sched = warmup_cosine_schedule(lr, min_lr, warmup, epochs, spe)

        def ref(epoch):
            if epoch < warmup:
                return lr * epoch / warmup
            return min_lr + (lr - min_lr) * 0.5 * (
                1.0 + math.cos(math.pi * (epoch - warmup) / (epochs - warmup))
            )

        for step in [0, 1, 50, 199, 200, 201, 500, 999]:
            np.testing.assert_allclose(float(sched(step)), ref(step / spe), rtol=1e-4, atol=1e-12)

    def test_base_lr_scaling(self):
        # main_ae.py:111-114: lr = blr * eff_batch / 256
        assert scale_base_lr(1e-4, 4, 1, 2) == pytest.approx(1e-4 * 8 / 256)


class TestStateAndEma:
    def test_ema_update(self):
        ema = {"w": jnp.ones((3,))}
        params = {"w": jnp.zeros((3,))}
        out = ema_update(ema, params, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9)

    def test_apply_gradients_steps_and_ema(self):
        params = {"w": jnp.ones((4,))}
        state = create_train_state(params, 0.1, clip_grad=1.0)
        grads = {"w": jnp.full((4,), 2.0)}
        new = state.apply_gradients(grads, ema_rate=0.5)
        assert int(new.step) == 1
        assert float(new.params["w"][0]) < 1.0  # moved against gradient
        expected_ema = 0.5 * 1.0 + 0.5 * float(new.params["w"][0])
        np.testing.assert_allclose(float(new.ema_params["w"][0]), expected_ema, rtol=1e-5)


class TestCheckpoint:
    def test_roundtrip_and_latest(self, tmp_path):
        params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.ones((2,))}
        state = create_train_state(params, 1e-3, clip_grad=1.0)
        state = state.apply_gradients({"a": jnp.ones((2, 3)), "b": jnp.ones((2,))})
        mgr = CheckpointManager(tmp_path)
        mgr.save(state, epoch=9)
        assert mgr.latest_epoch() == 9

        fresh = create_train_state(params, 1e-3, clip_grad=1.0)
        restored, epoch = mgr.restore(fresh)
        assert epoch == 9
        assert int(restored.step) == 1
        np.testing.assert_allclose(np.asarray(restored.params["a"]), np.asarray(state.params["a"]))
        np.testing.assert_allclose(
            np.asarray(restored.ema_params["a"]), np.asarray(state.ema_params["a"])
        )


class TestMetrics:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=2)
        for x in (1.0, 2.0, 3.0):
            v.update(x)
        assert v.global_avg == pytest.approx(2.0)
        assert v.avg == pytest.approx(2.5)  # window of 2

    def test_logger_iterates(self):
        logger = MetricLogger(print_fn=lambda *a, **k: None)
        seen = list(logger.log_every(range(5), 2, "hdr"))
        assert seen == list(range(5))


def _tiny_ae_cfg(root):
    from rald_tpu.data.synthetic import synthetic_dataset_config

    ds = synthetic_dataset_config(root)
    ds.lidar.num_samples = 512
    ds.batch_size = 1  # x8 devices -> global batch 8
    ds.num_workers = 2
    return Config(
        {
            "system": {"seed": 0, "mode": "train", "output_dir": str(root / "out"),
                       "log_dir": None, "compute_dtype": "float32"},
            "dataset": ds,
            "train": {
                "epochs": 3, "warmup_epochs": 0, "blr": 1e-3, "lr": 1e-3,
                "min_lr": 1e-6, "clip_grad": 10, "accum_iter": 1,
                "vol_weight": 0.1, "near_weight": 1.0,
                "save_ckpt_freq": 3, "eval_freq": 3, "use_ema": False,
            },
            "lidar_ae": {
                "name": "kl_d512_m512_l32_mix",
                "overrides": {
                    "dim": 64, "queries_dim": 64, "depth": 2, "num_latents": 16,
                    "latent_dim": 8, "heads": 4, "dim_head": 16,
                },
            },
            "eval": {"inference": {"num_query_points": 1024}, "freq": 1},
        }
    )


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from rald_tpu.data.synthetic import make_synthetic_coloradar

    root = tmp_path_factory.mktemp("synth")
    make_synthetic_coloradar(root, num_train_seqs=2, num_eval_seqs=1,
                             frames_per_seq=8, points_per_frame=4000)
    return root


class TestEndToEndAE:
    def test_train_eval_checkpoint(self, synth_root):
        from rald_tpu.cli.main_ae import run

        cfg = _tiny_ae_cfg(synth_root)
        stats = run(cfg)
        out = synth_root / "out"
        assert (out / "config.yml").exists()
        assert (out / "log.txt").exists()
        assert (out / "checkpoint-2").exists()
        assert 0.0 <= stats["iou"] <= 1.0
        # cd is inf when a barely-trained model predicts no positives — both fine here
        assert stats["cd"] > 0

        # training made progress: first epoch loss > last epoch loss
        import json

        records = [json.loads(l) for l in open(out / "log.txt")]
        losses = [r["train_loss"] for r in records if "train_loss" in r]
        assert len(losses) == 3
        assert losses[-1] < losses[0]

    def test_resume(self, synth_root):
        from rald_tpu.cli.main_ae import run

        cfg = _tiny_ae_cfg(synth_root)
        cfg.system.output_dir = str(synth_root / "out_resume")
        cfg.train.epochs = 4
        cfg.train.resume = str(synth_root / "out" / "checkpoint-2")
        cfg.train.eval_freq = 0
        cfg.train.save_ckpt_freq = 1
        run(cfg)  # resumes at epoch 3, trains one epoch
        assert (synth_root / "out_resume" / "checkpoint-3").exists()


class TestLrDecay:
    def test_scales_monotonic(self):
        from rald_tpu.train.lr_decay import lr_decay_scales

        params = {
            "point_embed": {"mlp": {"kernel": jnp.ones((3, 4))}},
            "block_0": {"attn": {"to_q": {"kernel": jnp.ones((4, 4))}}},
            "block_3": {"ff": {"proj_in": {"kernel": jnp.ones((4, 4))}}},
            "to_outputs": {"kernel": jnp.ones((4, 1))},
        }
        s = lr_decay_scales(params, depth=4, decay=0.5)
        emb = float(s["point_embed"]["mlp"]["kernel"])
        b0 = float(s["block_0"]["attn"]["to_q"]["kernel"])
        b3 = float(s["block_3"]["ff"]["proj_in"]["kernel"])
        head = float(s["to_outputs"]["kernel"])
        assert emb < b0 < b3 < head == 1.0
        assert emb == 0.5**5  # decay^(depth+1-0)

    def test_transform_scales_updates(self):
        import optax
        from rald_tpu.train.lr_decay import scale_by_layer_decay

        params = {"block_0": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
        tx = scale_by_layer_decay(params, depth=1, decay=0.5)
        updates = jax.tree_util.tree_map(jnp.ones_like, params)
        out, _ = tx.update(updates, tx.init(params))
        assert float(out["block_0"]["w"][0]) == 0.5  # decay^(2-1)
        assert float(out["head"]["w"][0]) == 1.0


class TestProfiler:
    def test_maybe_trace_noop_and_active(self, tmp_path):
        from rald_tpu.train.profiler import annotate, maybe_trace

        with maybe_trace():  # no dir configured -> no-op
            pass
        with maybe_trace(profile_dir=str(tmp_path / "prof")):
            with annotate("step"):
                jnp.ones((8, 8)).sum().block_until_ready()
        assert list((tmp_path / "prof").rglob("*"))  # trace artifacts written


class TestNonFiniteGuard:
    def test_skip_nonfinite_updates(self):
        params = {"w": jnp.ones((4,))}
        state = create_train_state(params, 0.1, clip_grad=1.0, skip_nonfinite=True)
        bad = {"w": jnp.full((4,), jnp.nan)}
        after_bad = state.apply_gradients(bad)
        np.testing.assert_allclose(  # update skipped, params unchanged
            np.asarray(after_bad.params["w"]), np.asarray(state.params["w"])
        )
        good = {"w": jnp.ones((4,))}
        after_good = after_bad.apply_gradients(good)
        assert float(after_good.params["w"][0]) < 1.0  # training continues


class TestGradAccumulation:
    def test_multisteps_applies_every_k(self):
        params = {"w": jnp.ones((4,))}
        state = create_train_state(params, 0.1, clip_grad=1.0, accum_iter=2)
        g = {"w": jnp.ones((4,))}
        s1 = state.apply_gradients(g)
        # first micro-step: accumulate only, params unchanged
        np.testing.assert_allclose(np.asarray(s1.params["w"]), 1.0)
        s2 = s1.apply_gradients(g)
        assert float(s2.params["w"][0]) < 1.0  # applied at the 2nd micro-step

    def test_accumulated_equals_big_batch_mean(self):
        """Two micro-grads averaged == one grad of their mean."""
        params = {"w": jnp.ones((3,))}
        acc = create_train_state(params, 0.1, accum_iter=2)
        g1 = {"w": jnp.asarray([1.0, 2.0, 3.0])}
        g2 = {"w": jnp.asarray([3.0, 2.0, 1.0])}
        acc = acc.apply_gradients(g1).apply_gradients(g2)

        big = create_train_state(params, 0.1)
        big = big.apply_gradients({"w": jnp.asarray([2.0, 2.0, 2.0])})
        np.testing.assert_allclose(
            np.asarray(acc.params["w"]), np.asarray(big.params["w"]), atol=1e-6
        )
