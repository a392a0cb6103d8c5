"""Offline inference CLI (rald_tpu.cli.infer): cubes on disk -> PLY files.

The reference has no standalone inference tool (its eval loop needs a full
processed dataset); this covers the serving-style surface we add on top:
checkpoint loading, raw-cube batching with pad-last, grid decode,
thresholding, and PLY output.
"""
from __future__ import annotations

import numpy as np
import pytest

from rald_tpu.config import Config

from test_generation import _gen_cfg


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from rald_tpu.data.synthetic import make_synthetic_coloradar

    root = tmp_path_factory.mktemp("infer_synth")
    make_synthetic_coloradar(
        root, num_train_seqs=1, num_eval_seqs=1, frames_per_seq=4,
        points_per_frame=2000, radar_shape=(32, 16, 16),
    )
    return root


def test_infer_cli_end_to_end(synth_root, tmp_path):
    """Save a checkpoint, point the CLI at loose .npy/.npz cubes, get PLYs."""
    from rald_tpu.cli.infer import run
    from rald_tpu.parallel.mesh import make_mesh
    from rald_tpu.train.checkpoint import CheckpointManager
    from rald_tpu.train.gen_engine import GenerationEngine

    cfg = _gen_cfg(synth_root, mode="eval")
    cfg.system.output_dir = str(tmp_path / "out")
    cfg.eval.inference.num_query_points = 512

    # a trained-enough stand-in: random init saved through the real manager
    engine = GenerationEngine(cfg, make_mesh())
    state = engine.init_state(steps_per_epoch=1, world_batch=1)
    ckpt = CheckpointManager(tmp_path / "ckpts")
    ckpt.save(state, epoch=0)
    cfg.eval.ckpt = str(tmp_path / "ckpts" / "checkpoint-0")

    # 3 loose already-processed cubes, dataset-layout (one .npz to cover both
    # loaders) -> 2 batches of 2 (pad-last)
    cubes = tmp_path / "cubes"
    cubes.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(cubes / f"{i:04d}.npy", rng.normal(size=(32, 16, 16, 2)).astype(np.float32))
    np.savez(cubes / "0002.npz", radar_cube=rng.normal(size=(32, 16, 16, 2)).astype(np.float32))

    out = tmp_path / "pred"
    stats = run(cfg, str(cubes), str(out), batch=2, preprocessed=True,
                print_fn=lambda *a: None)

    assert stats["files"] == 3
    plys = sorted(p.name for p in out.glob("*.ply"))
    assert plys == ["0000.ply", "0001.ply", "0002.ply"]
    # PLY parses back to an (N, 3) float array (N may be 0 for random weights)
    from rald_tpu.eval.ply import read_ply

    pts = read_ply(out / "0000.ply")
    assert pts.ndim == 2 and pts.shape[1] == 3

    # sharded grid decode over the 8-device CPU mesh, with a query count
    # that is NOT a multiple of the mesh size (exercises the pad/trim)
    cfg.eval.inference.shard_queries = True
    cfg.eval.inference.num_query_points = 510
    out2 = tmp_path / "pred_sharded"
    stats2 = run(cfg, str(cubes), str(out2), batch=2, preprocessed=True,
                 print_fn=lambda *a: None)
    assert stats2["files"] == 3
    assert sorted(p.name for p in out2.glob("*.ply")) == plys

    # RAW 3-channel cubes through the default host preprocessing (the same
    # transform the dataset applies), in two sequences with COLLIDING frame
    # names -> outputs mirror the tree instead of overwriting each other
    cfg.eval.inference.shard_queries = False
    raw = tmp_path / "raw"
    for seq in ("seqA", "seqB"):
        d = raw / seq / "radar_cube"
        d.mkdir(parents=True)
        np.save(d / "0000.npy", rng.normal(size=(32, 16, 16, 3)).astype(np.float32))
    out3 = tmp_path / "pred_raw"
    stats3 = run(cfg, str(raw), str(out3), batch=2, print_fn=lambda *a: None)
    assert stats3["files"] == 2
    got = sorted(str(p.relative_to(out3)) for p in out3.rglob("*.ply"))
    assert got == ["seqA/radar_cube/0000.ply", "seqB/radar_cube/0000.ply"]


def test_infer_rejects_empty_input(tmp_path, synth_root):
    from rald_tpu.cli.infer import collect_inputs

    with pytest.raises(FileNotFoundError):
        collect_inputs(str(tmp_path / "nothing"))
