"""Re-run the three-mode int8 quality gate through the product path.

VERDICT r3 "Next round" #7: the round-3 gate (docs/DESIGN.md "Round 3 int8
gate, reproduced") was anchored to the mid-training `checkpoint-119`; this
driver re-executes the identical protocol — `main_generation` eval mode on
the synthetic test split in three inference modes — against a given
(converged) stage-2 checkpoint:

    bf16            (parity-tested default)
    int8_ff         (DiT FF matmuls int8, dynamic per-token act scales)
    int8_ff + int8_attn='vout'  (plus v/out attention projections)
    int8_ff='static' + int8_attn='vout'  (calibrated per-(step, block)
        activation scales — only when <CKPT>/int8_act_scales.npz exists;
        produce it with scripts/calibrate_int8.py)

Usage:
  python scripts/int8_gate.py [CURVES_ROOT] [CKPT] [MODES]
    CURVES_ROOT: tree from scripts/rerun_to_convergence.sh (default /tmp/curves)
    CKPT:        stage-2 checkpoint dir (default <root>/out_gen/checkpoint-479)
    MODES:       comma-separated subset of mode names to (re-)run; other
                 modes' rows are kept from the existing artifact, so a new
                 mode can be gated without re-running the settled ones

Writes docs/artifacts/int8_gate_<ckpt-name>.json with IoU / CD / F-score
per mode and the deltas vs bf16.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import yaml  # noqa: E402

from rald_tpu.config import Config  # noqa: E402

MODES = (
    ("bf16", {"int8_ff": False, "int8_attn": False}),
    ("int8_ff", {"int8_ff": True, "int8_attn": False}),
    ("int8_ff+attn_vout", {"int8_ff": True, "int8_attn": "vout"}),
    ("int8_ff_static+attn_vout", {"int8_ff": "static", "int8_attn": "vout"}),
)


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/curves")
    ckpt = Path(sys.argv[2]) if len(sys.argv) > 2 else root / "out_gen" / "checkpoint-479"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    assert ckpt.exists(), f"no checkpoint at {ckpt}"
    if only:
        unknown = only - {n for n, _ in MODES}
        assert not unknown, f"unknown mode(s) {sorted(unknown)}"

    if os.environ.get("RALD_BENCH_CPU") == "1":  # harness smoke tests
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rald_tpu.cli.main_generation import run  # noqa: E402

    path = REPO / "docs" / "artifacts" / f"int8_gate_{ckpt.name}.json"
    results = {}
    if only and path.exists():
        # partial run: keep the settled rows for the modes we're not re-running
        prior = json.loads(path.read_text())
        if prior.get("ckpt") == str(ckpt):
            results = {k: v for k, v in prior["modes"].items() if k not in only}
    for name, flags in MODES:
        if only and name not in only:
            continue
        if flags.get("int8_ff") == "static" and not (ckpt / "int8_act_scales.npz").exists():
            print(f"=== mode {name} skipped: no {ckpt}/int8_act_scales.npz "
                  "(run scripts/calibrate_int8.py) ===", flush=True)
            continue
        cfg = Config(yaml.safe_load((root / "gen.yml").read_text()))
        cfg.system.mode = "eval"
        # keep main_generation's config snapshot out of the TRAINING output
        # dir (run() dump_config's unconditionally and would clobber the
        # archived training config.yml)
        cfg.system.output_dir = str(root / "int8_gate" / name)
        cfg.eval.ckpt = str(ckpt)
        cfg.eval.use_test_set = True
        cfg.eval.store_pc = False
        for k, v in flags.items():
            cfg.eval.inference[k] = v
        print(f"=== mode {name} ===", flush=True)
        stats = run(cfg)
        results[name] = {
            "iou": round(float(stats.get("iou", -1)), 4),
            "cd_m": round(float(stats.get("cd", -1)), 4),
            "fscore": round(float(stats.get("fscore", -1)), 4),
        }
        print(name, results[name], flush=True)

    base = results.get("bf16")
    if base is None:
        print(
            "NOTE: no bf16 row (run without MODES, or include 'bf16') — "
            "deltas vs bf16 omitted from this artifact", flush=True,
        )
    for name in results:
        if base is not None:
            results[name]["delta_iou_vs_bf16"] = round(results[name]["iou"] - base["iou"], 4)
        else:
            results[name].pop("delta_iou_vs_bf16", None)
    import jax

    out = {
        "ckpt": str(ckpt),
        "protocol": "main_generation eval mode, synthetic test split (gen.yml recipe)",
        "matmul_precision": str(jax.config.jax_default_matmul_precision or "default"),
        "backend": jax.default_backend(),
        "modes": results,
    }
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))
    print("written:", path)


if __name__ == "__main__":
    main()
