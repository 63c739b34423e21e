#!/usr/bin/env python3
"""Export a trained run's generator as a serialized serving artifact.

Usage:
    python scripts/export_model.py --run_dir runs/<run> --out model.jaxexport \
        [--batch N] [--platforms cpu,tpu] [--platform cpu]

Loads the run like test.py does (args.json + best_model/), re-builds the
task pure-XLA (Pallas lowerings are shape-specialized and don't export),
and writes a self-contained StableHLO artifact: params embedded, symbolic
batch dim unless --batch is given, `(x: f32[b,S,S,3], seed: i32[]) ->
f32[b,S,S,3]` serving signature. Reload anywhere with
`vae_cyclegan_tpu.utils.export.load(path).call(x, seed)` — no Python model
code or checkpoint needed at serving time.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True,
                   help="A run directory containing args.json + best_model/")
    p.add_argument("--out", required=True, help="Output artifact path")
    p.add_argument("--batch", type=int, default=None,
                   help="Fix the batch dimension (default: symbolic — one "
                        "artifact serves any batch size)")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated lowering targets, e.g. cpu,tpu "
                        "(default: the current backend)")
    p.add_argument("--platform", type=str, default=None,
                   help="Force the JAX backend for tracing (e.g. cpu); wins "
                        "over environment-injected platform plugins")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import json

    from test import load_model_for_inference
    from vae_cyclegan_tpu.utils import export as export_mod

    run_dir = Path(args.run_dir)
    args_file = run_dir / "args.json"
    if not args_file.exists():
        raise SystemExit(f"no args.json in {run_dir}")
    run = {
        "run_dir": run_dir,
        "name": run_dir.name,
        "args": json.loads(args_file.read_text()),
        "checkpoint": run_dir / "best_model",
    }
    # Pallas lowerings are shape-specialized; serve pure-XLA
    run["args"]["no_pallas"] = True
    task, state = load_model_for_inference(run)

    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_mod.export_generator(
        task, state, batch_size=args.batch, platforms=platforms
    )
    export_mod.save(exported, args.out)
    size_mb = Path(args.out).stat().st_size / 1e6
    print(f"exported {run['args']['architecture']} generator "
          f"({task.mc.image_size}x{task.mc.image_size}, batch "
          f"{'symbolic' if args.batch is None else args.batch}, platforms "
          f"{list(exported.platforms)}) -> {args.out} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
