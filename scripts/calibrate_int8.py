"""Calibrate static int8 FF activation scales for a stage-2 checkpoint.

``eval.inference.int8_ff: "static"`` replaces the int8 FF kernel's dynamic
per-token activation quantization with calibrated per-(schedule-step, block)
scales — dropping the per-token max reductions from the kernel's VPU chain
(the one stage above its measured floor in docs/DESIGN.md's roofline table).
This driver produces those scales:

  1. run the engine's own Heun sampler (capture_states) on a few eval
     batches — collecting exactly the (schedule index, latent state) pairs
     the deployed sampler visits;
  2. replay each state through the unfused full-precision denoiser with
     ``sow_quant_stats`` and reduce max|h| / max|g| per (step, block)
     (GenerationEngine.calibrate_act_scales).

Usage:
  python scripts/calibrate_int8.py [CURVES_ROOT] [CKPT] [NUM_BATCHES] [MARGIN]
    CURVES_ROOT: tree from scripts/rerun_to_convergence.sh (default /tmp/curves)
    CKPT:        stage-2 checkpoint dir (default <root>/out_gen/checkpoint-479)
    NUM_BATCHES: eval batches to calibrate on (default 8)
    MARGIN:      multiplier on the observed amax (default 1.10 — activations
                 above the calibrated scale saturate at eval time with int8
                 clip semantics, so a small sample needs headroom)

The defaults encode the round-5 gate failure: a 2-batch / 1.05-margin
calibration FAILED the ΔIoU ≤ 0.0005 bar on the converged rerun checkpoint
(ΔIoU −0.0008, CD +0.017 m — docs/artifacts/int8_gate_checkpoint-479.json),
consistent with eval-time activations clipping above the under-sampled amax.
Any future gate attempt starts from ≥8 batches and 1.10 headroom.

Writes <CKPT>/int8_act_scales.npz — the default path the engine loads when
``int8_ff: "static"`` is set. Quality-gate the result with
scripts/int8_gate.py (which includes the static mode).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from rald_tpu.config import Config  # noqa: E402


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/curves")
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else root / "out_gen" / "checkpoint-479"
    num_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    margin = float(sys.argv[4]) if len(sys.argv) > 4 else 1.10
    assert ckpt.exists(), f"no checkpoint at {ckpt}"

    if os.environ.get("RALD_BENCH_CPU") == "1":  # harness smoke tests
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = Config(yaml.safe_load((root / "gen.yml").read_text()))
    cfg.system.mode = "eval"
    cfg.eval.ckpt = str(ckpt)
    cfg.eval.use_test_set = True
    # capture the trajectory the QUANTIZED sampler actually visits: dynamic
    # int8 mode needs no calibration, and its trajectory is closer to the
    # static-int8 one than the bf16 trajectory is
    cfg.eval.inference.int8_ff = True

    from rald_tpu.cli.main_generation import build_loaders, load_frozen_modules  # noqa: E402
    from rald_tpu.parallel.mesh import enable_compilation_cache, init_distributed  # noqa: E402
    from rald_tpu.train.checkpoint import CheckpointManager  # noqa: E402
    from rald_tpu.train.gen_engine import GenerationEngine  # noqa: E402

    enable_compilation_cache()
    info = init_distributed()
    _, eval_loader, _ = build_loaders(cfg, info, "eval")
    engine = GenerationEngine(cfg)
    state = engine.init_state(1, int(cfg.dataset.batch_size))
    state, _ = CheckpointManager(ckpt.parent).restore(state, ckpt)
    _, radar_enc_params = load_frozen_modules(cfg, engine)
    use_ema = bool(cfg.train.get("use_ema", True))

    ah, ag = engine.calibrate_act_scales(
        state, eval_loader, radar_enc_params=radar_enc_params,
        num_batches=num_batches, use_ema=use_ema, margin=margin,
    )
    num_steps = int(engine.sampler_kwargs["num_steps"])
    path = ckpt / "int8_act_scales.npz"
    np.savez(path, ah=ah, ag=ag, num_steps=num_steps)
    print(f"h amax: per-step min {ah.min(1).round(2).tolist()}")
    print(f"        per-step max {ah.max(1).round(2).tolist()}")
    print(f"g amax: per-step min {ag.min(1).round(2).tolist()}")
    print(f"        per-step max {ag.max(1).round(2).tolist()}")
    print("written:", path)


if __name__ == "__main__":
    main()
