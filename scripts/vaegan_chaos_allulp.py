#!/usr/bin/env python3
"""All-tensors chaos control for the vaegan parity wobble.

The 5-probe band (scripts/vaegan_chaos_probe.py) perturbs ONE element
of ONE weight tensor by one ulp and measures 4.0-4.8% max wobble over
40 steps. But the framework difference is not one ulp once: every op
in a different-but-equivalent order injects ~1-ulp relative noise into
EVERY intermediate, every step. This script runs the torch reference
with every element of every weight tensor bumped by one ulp (nextafter)
— a perturbation whose magnitude is comparable to a single forward's
reassociation noise, still vastly below the per-step noise the
framework difference injects — and compares against the pristine
trajectory saved in docs/vaegan_chaos_probe.json (same seed, batches,
and recorded eps: the protocol is deterministic).

If this torch-vs-torch gap reaches the 5.7-6.4% the seeds measure for
ours-vs-torch, the framework sits inside the reference's own chaos
floor for an equivalent-magnitude perturbation.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scripts.vaegan_chaos_probe import _import_reference  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe_json", default="docs/vaegan_chaos_probe.json")
    ap.add_argument("--out", default="docs/vaegan_chaos_allulp.json")
    args = ap.parse_args(argv)

    base = json.loads(Path(args.probe_json).read_text())
    steps, batch, size, seed = (base["steps"], base["batch"],
                                base["image_size"], 0)
    a = base["G_loss_a"]

    import torch

    ref = _import_reference()
    rng = np.random.RandomState(seed)
    batches = [
        (rng.rand(batch, size, size, 3).astype(np.float32),
         rng.rand(batch, size, size, 3).astype(np.float32))
        for _ in range(steps)
    ]
    lat = size // 16
    eps_rs = np.random.RandomState(seed + 1)
    eps_all = [eps_rs.randn(batch, 64, lat, lat).astype(np.float32)
               for _ in range(steps * 2)]

    torch.manual_seed(seed)
    tmodel = ref.VAEGAN(latent_dim=64)
    tmodel.configure_optimizers(lr=2e-4)
    tmodel.configure_loss(lambda_kl=1e-5, lambda_gan=1.0,
                          lambda_identity=5.0, lambda_cycle=10.0,
                          lambda_recon=1.0)
    with torch.no_grad():
        inf = torch.tensor(float("inf"))
        for p in tmodel.parameters():
            if p.dim() > 1:  # weights only; biases are zero-init
                p.copy_(torch.nextafter(p, inf))

    t_iter = iter(eps_all)
    orig = torch.randn_like

    def t_randn_like(t, **kw):
        e = next(t_iter)
        assert tuple(t.shape) == e.shape
        return torch.from_numpy(e)

    torch.randn_like = t_randn_like
    curve = []
    try:
        for i, (x, y) in enumerate(batches):
            tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            ty = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
            m = tmodel.training_step({"x": tx, "y": ty})
            curve.append(float(m["G_loss"]))
            print(f"  step {i}: {curve[-1]:.4f} (pristine {a[i]:.4f})")
    finally:
        torch.randn_like = orig

    rel = [abs(x - y) / max(abs(y), 1e-9) for x, y in zip(curve, a)]
    result = {
        "architecture": "vaegan",
        "perturbation": "one ulp (nextafter toward +inf) on EVERY element"
                        " of every weight tensor",
        "steps": steps, "batch": batch, "image_size": size,
        "G_loss_pristine": a, "G_loss_perturbed": curve,
        "relative_gap": rel,
        "max_relative_gap": max(rel),
        "final_relative_gap": rel[-1],
    }
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(f"all-ulp torch-vs-torch: max gap {max(rel):.4%}, "
          f"final {rel[-1]:.4%}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
