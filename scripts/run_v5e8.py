#!/usr/bin/env python3
"""Turn-key first-session runbook for a REAL v5e-8 slice.

No multi-chip hardware exists in the dev environment (ROADMAP round-4),
so everything multi-chip is gate-proven on virtual meshes; this script
pins down the first hour on real hardware to one command:

    python scripts/run_v5e8.py            # full check, one JSON line
    python scripts/run_v5e8.py --spatial  # also price SP halo exchange

What it does, in order:
  1. asserts the backend is TPU with >= 8 chips;
  2. runs the PRODUCTION 8-chip configuration — flagship cyclevaegan,
     256x256 bf16, global batch 192 (24/chip, the measured single-chip
     optimum), Engine's shard_map-over-'data' path with the Pallas
     kernel suite ON — and measures aggregate + per-chip images/sec;
  3. PASS/FAIL against the single-chip baseline: per-chip rate must be
     >= PASS_FRACTION x SINGLE_CHIP_IMG_S (the 11M-param grad pmean over
     ICI should cost ~nothing: 44 MB bf16 at ~45 GB/s ICI ~ 1 ms of a
     337 ms step; anything below 90% means the all-reduce is NOT
     overlapping or the mesh fell back to replication — check the
     shard_batch warnings first);
  4. feed check: host loader-only rate (host-wire mode AND raw mode)
     vs the 8-chip demand = aggregate device rate. ROADMAP round-4
     arithmetic says >= 5 cores at the measured ~120 img/s/core
     host-wire rate, or ~2 cores in raw_mode on a PCIe host; this
     measures it on THE actual host;
  5. optional --spatial: a (4 data x 2 spatial) mesh on the same model
     — the first real halo-exchange price (the single-chip GSPMD+no-
     kernels price is 9.7%, ROADMAP; halos add on top).

Emits ONE JSON line (same contract as bench.py) with every number and
a "pass" verdict per gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Measured single-chip flagship rate (BENCH_r04: 70.578 img/s/chip,
# step p50 337.12 ms, batch 24 bf16, shard_map+Pallas path).
SINGLE_CHIP_IMG_S = 70.5
PASS_FRACTION = 0.90          # per-chip floor on the 8-chip mesh
PER_CHIP_BATCH = 24
IMAGE_SIZE = 256
WINDOW_STEPS = 10


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", action="store_true",
                    help="also measure a (4 data x 2 spatial) mesh")
    ap.add_argument("--devices", type=int, default=8,
                    help="mesh size (default 8 = one v5e-8 slice)")
    ap.add_argument("--skip_feed_check", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/jax_bench")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    result = {"metric": f"cyclevaegan {IMAGE_SIZE}x{IMAGE_SIZE} v5e-"
                        f"{args.devices} aggregate images/sec",
              "unit": "images/sec"}
    devs = jax.devices()
    if devs[0].platform != "tpu":
        print(json.dumps({**result, "value": 0.0,
                          "error": f"backend is {devs[0].platform}, not tpu"}))
        return 2
    if len(devs) < args.devices:
        print(json.dumps({**result, "value": 0.0,
                          "error": f"only {len(devs)} chips visible, "
                                   f"need {args.devices}"}))
        return 2

    from vae_cyclegan_tpu.config import ModelConfig
    from vae_cyclegan_tpu.engine import Engine
    from vae_cyclegan_tpu.models.tasks import create_task
    from vae_cyclegan_tpu.parallel import make_mesh, shard_batch

    n = args.devices
    batch = PER_CHIP_BATCH * n
    mc = ModelConfig(image_size=IMAGE_SIZE, latent_dim=64, base_width=64,
                     dtype=jnp.bfloat16)
    task = create_task("cyclevaegan", model=mc, paired=False)
    mesh = make_mesh(n)
    engine = Engine(task, mesh, donate=True)
    assert engine._use_shard_map, "production path must be shard_map"
    state = engine.init_state(seed=0)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    batch_np = {
        "x": np.asarray(jax.random.uniform(
            k1, (batch, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)),
        "y": np.asarray(jax.random.uniform(
            k2, (batch, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)),
    }
    sharded = shard_batch(dict(batch_np), mesh)
    assert not sharded["x"].sharding.is_fully_replicated, (
        "batch fell back to replication — all DP forfeited; "
        "is global batch divisible by the mesh?"
    )

    print(f"compiling the {n}-chip flagship step (cold ~8-10 min, "
          f"cached after)...", file=sys.stderr)
    for _ in range(3):
        state, m = engine.train_step(state, sharded)
    float(m["G_loss"])

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(WINDOW_STEPS):
            state, m = engine.train_step(state, sharded)
        float(m["G_loss"])
        rates.append(batch * WINDOW_STEPS / (time.perf_counter() - t0))
    agg = sorted(rates)[1]
    per_chip = agg / n
    floor = PASS_FRACTION * SINGLE_CHIP_IMG_S
    result.update({
        "value": round(agg, 2),
        "per_chip_images_per_sec": round(per_chip, 2),
        "single_chip_baseline": SINGLE_CHIP_IMG_S,
        "scaling_efficiency": round(per_chip / SINGLE_CHIP_IMG_S, 4),
        "pass_per_chip_floor": floor,
        "pass_scaling": bool(per_chip >= floor),
        "global_batch": batch,
    })

    if not args.skip_feed_check:
        # host feed capability vs the measured 8-chip demand
        import bench as bench_mod

        demand = agg
        try:
            os.environ.setdefault("BENCH_LOADER_WORKERS", "1,4,8")
            loader_rates = bench_mod._bench_loader_only(
                PER_CHIP_BATCH, IMAGE_SIZE
            )
            best = max(loader_rates.values())
            result["feed_check"] = {
                "demand_images_per_sec": round(demand, 1),
                "loader_only_images_per_sec": {
                    str(k): round(v, 1) for k, v in loader_rates.items()
                },
                "host_cores": len(os.sched_getaffinity(0)),
                "pass_feed": bool(best >= demand),
                "note": "host-wire rates; raw_mode row ('1_raw') is the "
                        "PCIe configuration — multiply by worker count "
                        "for multi-core scaling estimate",
            }
        except Exception as e:  # noqa: BLE001 — feed check is auxiliary
            result["feed_check_error"] = f"{type(e).__name__}: {e}"

    if args.spatial and n % 2 == 0:
        from vae_cyclegan_tpu.ops import starved_conv as _sc

        _sc.set_enabled(False)
        try:
            sp_mesh = make_mesh(n, spatial=2)
            sp_engine = Engine(task, sp_mesh, donate=True)
            sp_state = sp_engine.init_state(seed=0)
            sp_sharded = shard_batch(dict(batch_np), sp_mesh)
            for _ in range(3):
                sp_state, m = sp_engine.train_step(sp_state, sp_sharded)
            float(m["G_loss"])
            sp_rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(WINDOW_STEPS):
                    sp_state, m = sp_engine.train_step(sp_state, sp_sharded)
                float(m["G_loss"])
                sp_rates.append(
                    batch * WINDOW_STEPS / (time.perf_counter() - t0))
            sp_agg = sorted(sp_rates)[1]
            result["spatial_4x2"] = {
                "aggregate_images_per_sec": round(sp_agg, 2),
                "vs_dp": round(sp_agg / agg, 4),
                "note": "GSPMD lowering, kernels off (single-chip price "
                        "9.7%, ROADMAP) + real halo exchanges",
            }
        finally:
            _sc.set_enabled(True)

    print(json.dumps(result))
    return 0 if result.get("pass_scaling") else 1


if __name__ == "__main__":
    raise SystemExit(main())
