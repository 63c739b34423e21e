#!/usr/bin/env python3
"""Benchmark harness — ONE JSON line on stdout.

North-star metric (BASELINE.json): 256x256 train images/sec/chip on the
flagship VAE-CycleGAN (cyclevaegan), full G+D alternating train step.

Baseline: the reference publishes no numbers (README training table all
unchecked); the PyTorch-CPU reference was measured in-situ on this machine:
CycleVAEGAN training_step at 256x256 = 43.58 s/step @ batch 2
=> 0.0459 images/sec (see BASELINE.md). vs_baseline = ours / 0.0459.

Env knobs: BENCH_BATCH (default 8), BENCH_STEPS (default 10),
BENCH_PRECISION (float32|bf16, default float32), BENCH_ARCH.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_CPU_IMAGES_PER_SEC = 0.04589  # measured, see BASELINE.md


def main() -> None:
    from vae_cyclegan_tpu.config import ModelConfig
    from vae_cyclegan_tpu.models.tasks import create_task

    arch = os.environ.get("BENCH_ARCH", "cyclevaegan")
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "256"))

    mc = ModelConfig(
        image_size=image_size,
        latent_dim=64,
        base_width=64,
        dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32,
        use_pallas=False if os.environ.get("BENCH_NO_PALLAS") == "1" else None,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    # the BASELINE config #5: unpaired summer2winter-style full dual cycle
    task = create_task(arch, model=mc, paired=False)

    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng)
    k1, k2 = jax.random.split(rng)
    x = jax.random.uniform(k1, (batch, image_size, image_size, 3), jnp.float32)
    y = jax.random.uniform(k2, (batch, image_size, image_size, 3), jnp.float32)
    batch_data = {"x": x, "y": y}

    step_fn = jax.jit(task.train_step, donate_argnums=(0,))

    # warmup (compile + 2 steady steps); fetch a scalar to force completion —
    # block_until_ready is unreliable through remote-device tunnels.
    for _ in range(3):
        state, metrics = step_fn(state, batch_data)
    float(metrics["G_loss"])

    # Pipelined throughput, as the training loop actually runs: dispatch a
    # window of steps asynchronously and sync once at the end (the epoch
    # engine fetches metrics once per epoch). Take the best of 3 windows.
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, batch_data)
        float(metrics["G_loss"])
        rates.append(batch * steps / (time.perf_counter() - t0))
    images_per_sec = sorted(rates)[1]  # median window

    result = {
        "metric": f"{arch} {image_size}x{image_size} train images/sec/chip "
                  f"(G+D step, batch {batch}, {precision})",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / REFERENCE_CPU_IMAGES_PER_SEC, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — bench must always emit one line
        print(json.dumps({
            "metric": "bench_error",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
