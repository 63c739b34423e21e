#!/usr/bin/env python3
"""Chaos baseline for the vaegan 40-step parity wobble.

docs/parity_curves.json shows vaegan's jax-vs-torch G_loss gap peaking
at ~5.7% mid-trajectory while re-converging to 0.18% at step 40, with
exact 1-2-step oracle parity elsewhere in the suite. Hypothesis: the
adversarial G<->D feedback at batch 2 amplifies f32 rounding noise into
visible wobble — i.e. the mid-run gap is the system's intrinsic
sensitivity, not a framework wiring difference.

Test: run the REFERENCE (torch) against ITSELF from identical weights,
batches and reparameterization noise, with exactly one weight element of
run B bumped by one ulp (torch.nextafter) — the smallest representable
perturbation. If torch-vs-perturbed-torch shows the same-order max gap
over 40 steps, the framework gap is within the trajectory's Lyapunov
noise floor.

--probes N (default 5, VERDICT r4 item 2) runs N perturbed trajectories,
each bumping one element of a DIFFERENT weight tensor (ndim > 1 only —
biases are zero-init, where a multiplicative bump is a no-op), and
records the per-step chaos BAND: band[t] = max over probes of the
torch-vs-perturbed-torch relative gap at step t. The parity criterion
then becomes distributional: ours-vs-torch gap[t] <= band[t] point-wise
(evaluated by scripts/parity_curves.py --chaos_band).

Usage:
    python scripts/vaegan_chaos_probe.py --steps 40 --probes 5 \
        --out docs/vaegan_chaos_probe.json
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _import_reference():
    for name in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]
    sys.path.insert(0, "/root/reference")
    import Networks

    return Networks


def run_traj(ref, steps, batches, eps_all, seed, perturb: int = -1):
    """perturb < 0: pristine. perturb = i >= 0: multiply ONE weight of
    parameter tensor i (mod #tensors), flat index i, by (1 + 1e-7)."""
    import torch

    torch.manual_seed(seed)
    tmodel = ref.VAEGAN(latent_dim=64)
    tmodel.configure_optimizers(lr=2e-4)
    tmodel.configure_loss(
        lambda_kl=1e-5, lambda_gan=1.0, lambda_identity=5.0,
        lambda_cycle=10.0, lambda_recon=1.0,
    )
    if perturb >= 0:
        with torch.no_grad():
            # weight tensors only (ndim > 1): biases are zero-initialized
            # (Kaiming init, Networks.py:168-178), and 0 * (1 + 1e-7) is a
            # true no-op that would record a vacuous zero-gap probe
            params = [p for p in tmodel.parameters() if p.dim() > 1]
            p = params[perturb % len(params)]
            flat = p.view(-1)
            idx = perturb % flat.numel()
            # nextafter: exactly one ulp, guaranteed to change the value
            # (val * (1 + 1e-7) can round back to val for some mantissas)
            flat[idx] = torch.nextafter(
                flat[idx], torch.tensor(float("inf")))

    t_iter = iter(eps_all)
    orig = torch.randn_like

    def t_randn_like(t, **kw):
        e = next(t_iter)
        assert tuple(t.shape) == e.shape, (t.shape, e.shape)
        return torch.from_numpy(e)

    torch.randn_like = t_randn_like
    curve = []
    try:
        for x, y in batches:
            tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            ty = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
            m = tmodel.training_step({"x": tx, "y": ty})
            curve.append(float(m["G_loss"]))
    finally:
        torch.randn_like = orig
    return curve


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--probes", type=int, default=5)
    parser.add_argument("--out", type=str,
                        default="docs/vaegan_chaos_probe.json")
    args = parser.parse_args(argv)

    ref = _import_reference()
    rng = np.random.RandomState(args.seed)
    batches = [
        (
            rng.rand(args.batch, args.image_size, args.image_size, 3)
            .astype(np.float32),
            rng.rand(args.batch, args.image_size, args.image_size, 3)
            .astype(np.float32),
        )
        for _ in range(args.steps)
    ]
    lat = args.image_size // 16
    eps_rs = np.random.RandomState(args.seed + 1)
    # 2 reparam draws per vaegan step (Networks.py:1269-1276)
    eps_all = [
        eps_rs.randn(args.batch, 64, lat, lat).astype(np.float32)
        for _ in range(args.steps * 2)
    ]

    print("run A (pristine)...")
    a = run_traj(ref, args.steps, batches, list(eps_all), args.seed, -1)
    probes = []
    for i in range(args.probes):
        # spread probes across WEIGHT tensors (ndim > 1; biases are
        # zero-init no-ops): probe i bumps one element of weight tensor
        # 7i+1 by one ulp (coprime stride visits varied layers)
        which = 7 * i + 1
        print(f"run B{i} (one ulp on weight tensor {which})...")
        b = run_traj(ref, args.steps, batches, list(eps_all), args.seed,
                     which)
        rel = [abs(x - y) / max(abs(y), 1e-9) for x, y in zip(a, b)]
        probes.append({
            "perturbed_param_index": which,
            "G_loss_b": b,
            "relative_gap": rel,
            "max_relative_gap": max(rel),
            "final_relative_gap": rel[-1],
        })
        print(f"  probe {i}: max gap {max(rel):.4%}, final {rel[-1]:.4%}")
    band = [max(p["relative_gap"][t] for p in probes)
            for t in range(args.steps)]
    result = {
        "architecture": "vaegan",
        "perturbation": "one ulp (nextafter) on one element of a distinct"
                        " weight tensor per probe",
        "steps": args.steps,
        "batch": args.batch,
        "image_size": args.image_size,
        "n_probes": args.probes,
        "G_loss_a": a,
        "probes": probes,
        "chaos_band": band,
        "band_max": max(band),
        "probe_max_gaps": [p["max_relative_gap"] for p in probes],
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(f"torch-vs-perturbed-torch band max over {args.probes} probes: "
          f"{max(band):.4%}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
