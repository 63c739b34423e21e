#!/usr/bin/env python3
"""Convert a reference PyTorch .pth checkpoint into this framework's Orbax
run layout, so existing reference training runs can be resumed/evaluated
here.

Usage:
    python scripts/import_torch_checkpoint.py \
        --pth /path/to/best_model.pth --architecture cyclevaegan \
        --out runs/imported_run [--image_size 256 --latent_dim 64]

Writes <out>/best_model/ (Orbax TrainState: imported params + spectral
stats, FRESH optimizer states) and <out>/args.json so test.py discovers it.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", required=True,
                        help="reference checkpoint (.pth)")
    parser.add_argument("--architecture", required=True)
    parser.add_argument("--out", required=True, help="output run directory")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--latent_dim", type=int, default=64)
    parser.add_argument("--paired", action="store_true", default=False)
    parser.add_argument("--dataset", default="hypersim")
    parser.add_argument("--source_modality", default="depth")
    parser.add_argument("--target_modality", default="normal")
    parser.add_argument("--fresh_optimizer", action="store_true",
                        default=False,
                        help="skip importing the checkpoint's Adam moments "
                             "(by default they are imported so resumed "
                             "training keeps its momentum)")
    args = parser.parse_args(argv)

    import jax
    import torch

    from vae_cyclegan_tpu.config import ModelConfig
    from vae_cyclegan_tpu.models.tasks import create_task
    from vae_cyclegan_tpu.utils import save_checkpoint
    from vae_cyclegan_tpu.utils.torch_import import (
        load_adam_moments_into_state,
        load_into_state,
    )

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    epoch = int(ckpt.get("epoch", 0))
    loss = float(ckpt.get("loss", 0.0))
    ref_args = ckpt.get("args", {})

    task = create_task(
        args.architecture,
        model=ModelConfig(image_size=args.image_size,
                          latent_dim=args.latent_dim),
        paired=args.paired or bool(ref_args.get("paired", False)),
    )
    state = task.init_state(jax.random.PRNGKey(0))
    state = load_into_state(state, args.architecture, sd)
    opt_states = ckpt.get("optimizer_states")
    # torch Adam populates its state lazily; never-stepped optimizers have
    # nothing to import
    if opt_states and not all(v.get("state") for v in opt_states.values()):
        opt_states = None
    if opt_states and not args.fresh_optimizer:
        opt_np = {
            k: {
                "param_groups": v["param_groups"],
                "state": {
                    i: {kk: (vv.detach().numpy()
                             if hasattr(vv, "detach") else vv)
                        for kk, vv in s.items()}
                    for i, s in v["state"].items()
                },
            }
            for k, v in opt_states.items()
        }
        state = load_adam_moments_into_state(
            state, args.architecture, sd, opt_np
        )
        print("imported Adam moments from the reference optimizer states")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    run_args = {
        "architecture": args.architecture,
        "image_size": args.image_size,
        "latent_dim": args.latent_dim,
        "paired": args.paired,
        "dataset": ref_args.get("dataset", args.dataset),
        "source_modality": ref_args.get("source_modality",
                                        args.source_modality),
        "target_modality": ref_args.get("target_modality",
                                        args.target_modality),
        "imported_from": str(args.pth),
    }
    with open(out / "args.json", "w") as f:
        json.dump(run_args, f, indent=2)
    save_checkpoint(state, epoch, loss, run_args, out / "best_model")
    print(f"imported {args.pth} -> {out} (epoch {epoch}, loss {loss:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
