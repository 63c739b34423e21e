#!/usr/bin/env python3
"""Loss-curve parity harness: train the reference (torch) and this framework
side by side from IDENTICAL initial weights on an IDENTICAL batch sequence,
and record per-step loss trajectories.

Covers the BASELINE.json parity requirement ("per-loss curves within 2%")
for all five config families:
  * deterministic (autoencoder, cycleae): identical batches suffice;
  * variational/GAN (vae, vaegan, cyclevaegan): both frameworks consume
    ONE recorded reparameterization-eps sequence — torch.randn_like is
    patched to pop it (reference draw site Networks.py:225), and the jax
    step takes the same eps as jit ARGUMENTS via parallel.dp.eps_queue
    (one compile for the whole trajectory, no per-step retrace).

The GAN families run at the native 256x256 (the reference Discriminator
hardcodes its 16x16 final kernel, Networks.py:248); vae runs at any size.

Usage:
    python scripts/parity_curves.py --steps 40 --out docs/parity_curves.json
    python scripts/parity_curves.py --archs vae vaegan cyclevaegan \
        --steps 40 --out docs/parity_curves_variational.json

Requires the reference repo mounted at /root/reference (read-only oracle).
"""

from __future__ import annotations

import argparse
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
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.path.insert(0, "/root/reference")
    import Networks

    return Networks


# reparameterization draws per training step, in reference call order
# (vae: forward(x); vaegan: G(x), G(y), Networks.py:1269-1276;
#  doublevae: vae_block_A(enc(x)), vae_block_B(enc(y)), Networks.py:785-792;
#  cyclevae: G(x), F(Gx), F(y), G(Fy), Networks.py:1490-1493;
#  cyclevaegan: G(x), G(y), F(Gx), F(y), F(x), G(Fy), Networks.py:1909-1915)
_EPS_PER_STEP = {"vae": 1, "vaegan": 2, "doublevae": 2, "cyclevae": 4,
                 "cyclevaegan": 6}
# GAN discriminators hardcode the 16x16 final kernel (Networks.py:248):
# those archs only exist at 256^2 in the reference
_FORCE_256 = {"vaegan", "cyclevaegan", "cycleaegan", "aegan"}


def run_pair(arch: str, steps: int, image_size: int, batch: int, seed: int):
    import jax
    import jax.numpy as jnp
    import torch

    from vae_cyclegan_tpu.config import ModelConfig, OptimConfig, LossConfig
    from vae_cyclegan_tpu.models.tasks import create_task
    from vae_cyclegan_tpu.parallel import eps_queue
    from vae_cyclegan_tpu.utils.torch_import import load_into_state

    if arch in _FORCE_256:
        image_size = 256
    ref = _import_reference()
    torch.manual_seed(seed)
    if arch == "autoencoder":
        tmodel = ref.Autoencoder()
    elif arch == "cycleae":
        tmodel = ref.CycleAE(paired=True)
    elif arch == "vae":
        tmodel = ref.VariationalAutoencoder(latent_dim=64)
    elif arch == "doubleae":
        tmodel = ref.DoubleAutoencoder()
    elif arch == "doublevae":
        tmodel = ref.DoubleVariationalAutoencoder(latent_dim=64)
    elif arch == "cyclevae":
        tmodel = ref.CycleVAE(latent_dim=64, paired=True)
    elif arch == "aegan":
        tmodel = ref.AEGAN()
    elif arch == "vaegan":
        tmodel = ref.VAEGAN(latent_dim=64)
    elif arch == "cyclevaegan":
        tmodel = ref.CycleVAEGAN(latent_dim=64, paired=True)
    else:
        raise ValueError(f"unsupported arch {arch}")
    tmodel.configure_optimizers(lr=2e-4)
    tmodel.configure_loss(
        lambda_kl=1e-5, lambda_gan=1.0, lambda_identity=5.0,
        lambda_cycle=10.0, lambda_recon=1.0,
    )

    task = create_task(
        arch,
        model=ModelConfig(image_size=image_size, base_width=64,
                          use_pallas=False),
        optim=OptimConfig(lr=2e-4),
        loss=LossConfig(),
        paired=True,
    )
    state = task.init_state(jax.random.PRNGKey(0))
    state = load_into_state(
        state, arch,
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
    )

    rng = np.random.RandomState(seed)
    # fixed batch sequence shared by both frameworks
    batches = [
        (
            rng.rand(batch, image_size, image_size, 3).astype(np.float32),
            rng.rand(batch, image_size, image_size, 3).astype(np.float32),
        )
        for _ in range(steps)
    ]

    n_eps = _EPS_PER_STEP.get(arch, 0)
    lat = image_size // 16
    eps_rs = np.random.RandomState(seed + 1)
    if n_eps:
        # one recorded eps sequence, NCHW for torch / NHWC for jax
        eps_all = [
            eps_rs.randn(batch, 64, lat, lat).astype(np.float32)
            for _ in range(steps * n_eps)
        ]
        t_iter = iter(eps_all)
        orig_randn_like = torch.randn_like

        def t_randn_like(t, **kw):
            e = next(t_iter)
            assert tuple(t.shape) == e.shape, (t.shape, e.shape)
            return torch.from_numpy(e)

        torch.randn_like = t_randn_like

        def step_with_eps(s, b, eps):
            # eps enter as jit ARGUMENTS; dp_normal pops them in trace
            # order inside the step — one compile for all `steps` steps
            with eps_queue(list(eps)):
                return task.train_step(s, b)

        step_fn = jax.jit(step_with_eps)
    else:
        step_fn = jax.jit(task.train_step)

    try:
        torch_curve, jax_curve = [], []
        comp_curves_t, comp_curves_j = {}, {}
        for i, (x, y) in enumerate(batches):
            tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            ty = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
            t_metrics = tmodel.training_step({"x": tx, "y": ty})
            torch_curve.append(float(t_metrics["G_loss"]))
            jb = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
            if n_eps:
                eps = tuple(
                    jnp.asarray(np.transpose(e, (0, 2, 3, 1)))
                    for e in eps_all[i * n_eps:(i + 1) * n_eps]
                )
                state, j_metrics = step_fn(state, jb, eps)
            else:
                state, j_metrics = step_fn(state, jb)
            jax_curve.append(float(j_metrics["G_loss"]))
            for k, tv in t_metrics.items():
                if k in j_metrics and k != "G_loss":
                    comp_curves_t.setdefault(k, []).append(float(tv))
                    comp_curves_j.setdefault(k, []).append(
                        float(j_metrics[k])
                    )
    finally:
        if n_eps:
            torch.randn_like = orig_randn_like

    rel = [
        abs(a - b) / max(abs(b), 1e-9) for a, b in zip(jax_curve, torch_curve)
    ]
    comp_gaps = {
        k: max(
            abs(a - b) / max(abs(b), 1e-2)
            for a, b in zip(comp_curves_j[k], comp_curves_t[k])
        )
        for k in comp_curves_t
    }
    return {
        "architecture": arch,
        "steps": steps,
        "image_size": image_size,
        "batch": batch,
        "torch_G_loss": torch_curve,
        "jax_G_loss": jax_curve,
        "relative_gap": rel,
        "max_relative_gap": max(rel),
        "final_relative_gap": rel[-1],
        "component_max_relative_gap": comp_gaps,
        "torch_components": comp_curves_t,
        "jax_components": comp_curves_j,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--image_size", type=int, default=64)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--archs", nargs="+",
                        default=["autoencoder", "cycleae"])
    parser.add_argument("--seeds", type=int, nargs="+", default=None,
                        help="run each arch at several seeds and record "
                             "the gap DISTRIBUTION (VERDICT r4 item 2); "
                             "default: just --seed")
    parser.add_argument("--chaos_band", type=str, default=None,
                        help="path to a vaegan_chaos_probe.json; each "
                             "seed's ours-vs-torch gap is compared "
                             "point-wise against the torch-vs-torch "
                             "chaos band (only meaningful when steps/"
                             "batch/image_size match the probe run)")
    parser.add_argument("--cycleaegan_steps", type=int, default=0,
                        help="also run N full CycleAEGAN steps at 256^2")
    parser.add_argument("--out", type=str, default="docs/parity_curves.json")
    parser.add_argument("--platform", type=str, default="cpu",
                        help="jax platform for the jax side (default cpu: "
                             "exact f32 convs — TPU f32 convs use bf16 "
                             "passes whose drift compounds over the "
                             "recurrent 40-step parameter trajectory)")
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: the campaign runs one (arch, seed) per
    # process (scripts/parity_campaign_r5b.sh), so without this every
    # seed re-pays the 256^2 trace+compile
    try:
        import os

        cache = os.path.expanduser("~/.cache/jax_parity")
        os.makedirs(cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    band = None
    if args.chaos_band:
        band = json.loads(Path(args.chaos_band).read_text())["chaos_band"]

    results = []
    archs = [a for a in args.archs if a != "none"]
    seeds = args.seeds if args.seeds else [args.seed]
    for arch in archs:
        runs = []
        for seed in seeds:
            print(f"running {arch} seed {seed} for {args.steps} steps "
                  f"in both frameworks...")
            r = run_pair(arch, args.steps, args.image_size, args.batch,
                         seed)
            r["seed"] = seed
            if band is not None and len(band) == len(r["relative_gap"]):
                # point-wise: is the framework gap within the reference's
                # own 1e-7-perturbation chaos band at every step?
                over = [t for t, (g, b) in
                        enumerate(zip(r["relative_gap"], band)) if g > b]
                r["steps_above_chaos_band"] = over
                r["within_chaos_band"] = not over
            print(f"  {arch} seed {seed}: max gap "
                  f"{r['max_relative_gap']:.4%}, final "
                  f"{r['final_relative_gap']:.4%}"
                  + (f", within chaos band: {r['within_chaos_band']}"
                     if "within_chaos_band" in r else ""))
            runs.append(r)
        if len(runs) == 1:
            results.append(runs[0])
        else:
            results.append({
                "architecture": arch,
                "steps": args.steps,
                "image_size": runs[0]["image_size"],
                "batch": args.batch,
                "seeds": seeds,
                "max_relative_gap_per_seed":
                    [r["max_relative_gap"] for r in runs],
                "final_relative_gap_per_seed":
                    [r["final_relative_gap"] for r in runs],
                "max_relative_gap": max(r["max_relative_gap"]
                                        for r in runs),
                "within_chaos_band_per_seed":
                    [r.get("within_chaos_band") for r in runs],
                "runs": runs,
            })

    if args.cycleaegan_steps > 0:
        print(f"running cycleaegan for {args.cycleaegan_steps} full steps...")
        results.append(run_cycleaegan_steps(args.cycleaegan_steps,
                                            seed=args.seed))

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    return 0




def run_cycleaegan_steps(steps: int = 2, batch: int = 1, seed: int = 0):
    """One-off metric-by-metric parity for CycleAEGAN full steps at the
    native 256x256 (its torch Discriminator hardcodes the 16x16 head).
    Deterministic architecture: exact comparison is meaningful."""
    import jax
    import jax.numpy as jnp
    import torch

    from vae_cyclegan_tpu.config import ModelConfig, OptimConfig
    from vae_cyclegan_tpu.models.tasks import create_task
    from vae_cyclegan_tpu.utils.torch_import import load_into_state

    ref = _import_reference()
    torch.manual_seed(seed)
    tm = ref.CycleAEGAN(paired=True)
    tm.configure_optimizers(lr=2e-4)
    tm.configure_loss(lambda_gan=1.0, lambda_identity=5.0, lambda_cycle=10.0)

    task = create_task(
        "cycleaegan",
        model=ModelConfig(image_size=256, base_width=64, use_pallas=False),
        optim=OptimConfig(lr=2e-4),
        paired=True,
    )
    state = task.init_state(jax.random.PRNGKey(0))
    state = load_into_state(
        state, "cycleaegan",
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
    )
    step_fn = jax.jit(task.train_step)

    rng = np.random.RandomState(seed)
    records = []
    for i in range(steps):
        x = rng.rand(batch, 256, 256, 3).astype(np.float32)
        y = rng.rand(batch, 256, 256, 3).astype(np.float32)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ty = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
        t_metrics = tm.training_step({"x": tx, "y": ty})
        state, j_metrics = step_fn(
            state, {"x": jnp.asarray(x), "y": jnp.asarray(y)}
        )
        gaps = {}
        for k, tv in t_metrics.items():
            if k in j_metrics:
                jv = float(j_metrics[k])
                gaps[k] = {
                    "torch": float(tv),
                    "jax": jv,
                    "abs_gap": abs(jv - float(tv)),
                }
        records.append(gaps)
        worst = max(gaps.items(), key=lambda kv: kv[1]["abs_gap"])
        print(f"  step {i}: worst metric gap {worst[0]} = "
              f"{worst[1]['abs_gap']:.5f} "
              f"(torch {worst[1]['torch']:.4f} vs jax {worst[1]['jax']:.4f})")
    return {"architecture": "cycleaegan", "steps": steps,
            "image_size": 256, "batch": batch, "per_step_metrics": records}


if __name__ == "__main__":
    raise SystemExit(main())
