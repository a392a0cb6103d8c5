"""Config system tests (reference YAML->EasyDict surface + sweep semantics)."""
import yaml

from rald_tpu.config import Config, dump_config, expand_experiment_sweep, finalize_dirs, load_config


class TestConfig:
    def test_attribute_and_item_access(self):
        cfg = Config({"train": {"lr": 1e-4, "nested": {"x": [1, 2]}}})
        assert cfg.train.lr == cfg["train"]["lr"] == 1e-4
        assert cfg.train.nested.x == [1, 2]
        cfg.train.lr = 2e-4
        assert cfg["train"]["lr"] == 2e-4
        assert cfg.train.get("missing", 7) == 7

    def test_load_dump_roundtrip(self, tmp_path):
        src = tmp_path / "a.yml"
        src.write_text(yaml.safe_dump({"system": {"seed": 3}, "dataset": {"batch_size": 4}}))
        cfg = load_config(src)
        assert cfg.system.seed == 3
        dump_config(cfg, tmp_path / "out" / "snap.yml")
        again = load_config(tmp_path / "out" / "snap.yml")
        assert again.to_dict() == cfg.to_dict()

    def test_finalize_dirs_joins_expname(self):
        cfg = Config({"system": {"expname": "exp1", "output_dir": "/o", "log_dir": "/l"}})
        finalize_dirs(cfg)
        assert cfg.system.output_dir.endswith("/o/exp1")
        assert cfg.system.log_dir.endswith("/l/exp1")

    def test_scene_sweep_expansion(self):
        """dict-valued split_file fans out per scene (reference main_ae.py:202-212)."""
        cfg = Config(
            {
                "system": {"output_dir": "/o", "log_dir": "/l"},
                "dataset": {"split_file": {"hall": "hall.json", "lab": "lab.json"}},
            }
        )
        runs = list(expand_experiment_sweep(cfg))
        assert [s for s, _ in runs] == ["hall", "lab"]
        hall = runs[0][1]
        assert hall.dataset.split_file == "hall.json"
        assert hall.system.output_dir.endswith("/o/hall")
        # original untouched
        assert isinstance(cfg.dataset.split_file, dict)

    def test_no_sweep_passthrough(self):
        cfg = Config({"dataset": {"split_file": "one.json"}})
        runs = list(expand_experiment_sweep(cfg))
        assert runs[0][0] is None and runs[0][1] is cfg


class TestCartQueries:
    def test_cart_query_points_inside_polar_box(self):
        import numpy as np

        from rald_tpu import geometry as geo
        from rald_tpu.eval.queries import generate_query_points_cart

        rng = np.random.default_rng(0)
        pc_range = [0, -90, -20, 15.8, 90, 20]        # polar box
        pc_range_cart = [0, -15, -5, 15, 15, 5]       # cartesian box
        pts = generate_query_points_cart(5000, pc_range_cart, pc_range, True, False, rng)
        assert pts.shape == (5000, 3)
        # strictly inside the open normalized cube
        assert (np.abs(pts) < 1).all()
        # and their cartesian pre-images lie in the cartesian box
        cart = geo.polar2cartesian(geo.inverse_norm_points(pts, pc_range, True, False))
        lo, hi = np.array(pc_range_cart[:3]), np.array(pc_range_cart[3:])
        assert (cart >= lo - 1e-3).all() and (cart <= hi + 1e-3).all()

    def test_disjoint_boxes_raise(self):
        import numpy as np
        import pytest as _pytest

        from rald_tpu.eval.queries import generate_query_points_cart

        with _pytest.raises(ValueError):
            generate_query_points_cart(
                100, [100, 100, 100, 101, 101, 101], [0, -90, -20, 15.8, 90, 20],
                True, False, np.random.default_rng(0), max_rounds=3,
            )


class TestConfigInventory:
    """Every shipped config parses and is consumable by its CLI surface
    (VERDICT.md round-1 missing #3: 1:1 inventory with the reference)."""

    def _repo(self):
        import pathlib

        return pathlib.Path(__file__).resolve().parents[1]

    def test_all_yaml_parse(self):
        paths = sorted(self._repo().glob("configs/**/*.yml"))
        assert len(paths) >= 10, [p.name for p in paths]
        for p in paths:
            cfg = load_config(p)
            assert isinstance(cfg, Config), p

    def test_train_eval_pairs_exist(self):
        """Reference ships train+eval variants for both experiments."""
        repo = self._repo()
        assert (repo / "configs/ae/ae_indoor_aniso_mix_view_cone.yml").exists()
        assert (repo / "configs/ae/ae_indoor_aniso_mix_view_cone_eval.yml").exists()
        assert (repo / "configs/generation/ge_indoor_unfreeze_enc_ints_only.yml").exists()
        assert (repo / "configs/generation/ge_indoor_unfreeze_enc_ints_only_eval.yml").exists()

    def test_model_names_resolve(self):
        from rald_tpu.models.registry import (
            AE_VARIANTS,
            GENERATION_VARIANTS,
            RADAR_ENCODER_VARIANTS,
        )

        for p in sorted(self._repo().glob("configs/ae/*.yml")):
            assert load_config(p).lidar_ae.name in AE_VARIANTS, p
        for p in sorted(self._repo().glob("configs/generation/*.yml")):
            cfg = load_config(p)
            assert cfg.ar_model.name in GENERATION_VARIANTS, p
            assert cfg.lidar_ae.name in AE_VARIANTS, p
            assert cfg.radar_enc.name in RADAR_ENCODER_VARIANTS, p

    def test_eval_variants_semantics(self):
        """Eval ymls carry the reference's eval-only knobs."""
        repo = self._repo()
        ae = load_config(repo / "configs/ae/ae_indoor_aniso_mix_view_cone_eval.yml")
        assert ae.system.mode == "eval" and ae.eval.get("ckpt")
        assert isinstance(ae.dataset.split_file, dict)  # per-scene sweep
        assert len(list(expand_experiment_sweep(ae))) == 5

        ge = load_config(repo / "configs/generation/ge_indoor_unfreeze_enc_ints_only_eval.yml")
        assert ge.system.mode == "eval"
        assert ge.dataset.lidar.sampling is False  # raw per-frame clouds
        inf = ge.eval.inference
        assert inf.refine_query and inf.refine_query_scale == 10
        assert float(inf.query_aug_num) == 7e5
        assert ge.eval.store_pc and ge.eval.save_pc_dir_name.startswith("pred_ply")
        assert "use_pred_latent" in ge.eval and "use_pred_latent" in ge.dataset

    def test_preprocess_config_references_exist(self):
        """Preprocess ymls point at radar chirp configs that ship in-repo."""
        repo = self._repo()
        names = {p.name for p in repo.glob("configs/preprocess/*.yml")}
        for want in (
            "coloradar.yml",
            "coloradar_test_set.yml",
            "coloradar_test_set_outdoor.yml",
            "hustradar.yml",
            "hustradar_test_set.yml",
            "1843_coloradar.yml",
            "1843_coloradar_test_set.yml",
        ):
            assert want in names, (want, names)
        for p in sorted(repo.glob("configs/preprocess/*.yml")):
            cfg = load_config(p)
            if "single_chip_mode" not in cfg:
                continue  # chirp parameter files themselves
            radar = cfg.single_chip_mode.radar
            assert (repo / radar.config).exists(), p
            assert (repo / radar.antenna_file_path).exists(), p
            if "cfar" in radar:
                assert float(radar.cfar.cfar_num_point) == 8e5
