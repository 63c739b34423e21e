#!/usr/bin/env python3
"""Measure the PyTorch-CPU reference's training throughput in-situ for the
BASELINE.json config families (VERDICT r3 item 7 — only cyclevaegan and
autoencoder were measured in round 1; this completes the table).

Runs each architecture's own training_step (reference Networks.py) on
random 256x256 batches with default hyperparameters, exactly like the
round-1 flagship measurement (BASELINE.md): torchvision is stubbed out
(not installed here; unused by the model/training path), batch 2, p50
over `--steps` timed steps after one warmup.

Usage:
    python scripts/measure_reference_baseline.py \
        --archs vae aegan vaegan cycleae cycleaegan \
        --steps 3 --out docs/reference_baseline.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import types
from pathlib import Path

import numpy as np


def _import_reference():
    for name in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]
    sys.path.insert(0, "/root/reference")
    import Networks

    return Networks


def build(ref, arch: str):
    if arch == "autoencoder":
        m = ref.Autoencoder()
    elif arch == "vae":
        m = ref.VariationalAutoencoder(latent_dim=64)
    elif arch == "aegan":
        m = ref.AEGAN()
    elif arch == "vaegan":
        m = ref.VAEGAN(latent_dim=64)
    elif arch == "cycleae":
        m = ref.CycleAE(paired=True)
    elif arch == "cyclevae":
        m = ref.CycleVAE(paired=True)
    elif arch == "cycleaegan":
        m = ref.CycleAEGAN(paired=True)
    elif arch == "cyclevaegan":
        m = ref.CycleVAEGAN(paired=True)
    else:
        raise ValueError(arch)
    m.configure_optimizers(lr=2e-4)
    m.configure_loss(
        lambda_kl=1e-5, lambda_gan=1.0, lambda_identity=5.0,
        lambda_cycle=10.0, lambda_recon=1.0,
    )
    return m


def measure(ref, arch: str, steps: int, batch: int, image_size: int):
    import torch

    torch.manual_seed(0)
    m = build(ref, arch)
    rng = np.random.RandomState(0)

    def mk():
        x = rng.rand(batch, 3, image_size, image_size).astype(np.float32)
        y = rng.rand(batch, 3, image_size, image_size).astype(np.float32)
        return {"x": torch.from_numpy(x), "y": torch.from_numpy(y)}

    m.training_step(mk())  # warmup (allocator, thread pools)
    times = []
    for _ in range(steps):
        b = mk()
        t0 = time.perf_counter()
        m.training_step(b)
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    return {
        "architecture": arch,
        "batch": batch,
        "image_size": image_size,
        "steps_timed": steps,
        "step_time_s_p50": round(p50, 3),
        "step_times_s": [round(t, 3) for t in times],
        "images_per_sec": round(batch / p50, 5),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--archs", nargs="+",
                   default=["vae", "aegan", "vaegan", "cycleae",
                            "cycleaegan"])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--out", type=str, default="docs/reference_baseline.json")
    args = p.parse_args(argv)

    ref = _import_reference()
    results = []
    for arch in args.archs:
        print(f"measuring reference {arch} ({args.steps} steps, batch "
              f"{args.batch}, {args.image_size}^2, CPU)...", flush=True)
        r = measure(ref, arch, args.steps, args.batch, args.image_size)
        print(f"  {arch}: p50 {r['step_time_s_p50']} s/step = "
              f"{r['images_per_sec']} img/s", flush=True)
        results.append(r)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    json.dump(results, open(out, "w"), indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
