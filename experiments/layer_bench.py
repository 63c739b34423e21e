#!/usr/bin/env python3
"""Per-layer microbenchmark over the model zoo's actual layer shapes.

Times forward+backward of each distinct (spatial, cin, cout, kernel) conv +
InstanceNorm + activation block at the training batch size, so kernel work
(ROADMAP.md items 1-3) can be prioritized by measured per-layer cost
instead of whole-step profiles.

Usage (on TPU):  python experiments/layer_bench.py [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from vae_cyclegan_tpu.ops import instance_norm_act, pixel_unshuffle
from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv

# (name, spatial, cin, cout, k, order) — encoder/decoder stack at 256^2,
# base_width 64 (Networks.py:154-211); DBlock convs run on the unshuffled
# grid (spatial/2, cin*4).
LAYERS = [
    ("CaSb 3->64 k7 @256", 256, 3, 64, 7, "norm_act"),
    ("D1 256->128 @128", 128, 256, 128, 3, "act_norm"),
    ("D2 512->256 @64", 64, 512, 256, 3, "act_norm"),
    ("D3 1024->512 @32", 32, 1024, 512, 3, "act_norm"),
    ("D4 2048->1024 @16", 16, 2048, 1024, 3, "act_norm"),
    ("R 1024->1024 @16", 16, 1024, 1024, 3, "act_norm"),
    ("U1 256->512 @32", 32, 256, 512, 3, "act_norm"),
    ("U2 128->256 @64", 64, 128, 256, 3, "act_norm"),
    ("U3 64->128 @128", 128, 64, 128, 3, "act_norm"),
    ("U4 32->64 @256", 256, 32, 64, 3, "act_norm"),
    ("CaSb 64->3 k7 @256", 256, 64, 3, 7, "none"),
]


REPEATS = 16  # amortize the ~40ms dispatch+loss-harness floor per timing


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"batch={batch}, dtype=bfloat16, repeats={REPEATS}, "
          f"backend={jax.default_backend()}")
    total = 0.0
    for name, s, cin, cout, k, order in LAYERS:
        x = jax.random.normal(key, (batch, s, s, cin), dtype)
        w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05

        def block(x_, w_):
            y = reflect_conv(x_, w_)
            if order == "none":
                return y
            return instance_norm_act(y, act="relu", order=order)

        def loss(w_, x_):
            # scan REPEATS applications with a per-step input perturbation
            # so XLA cannot CSE them into one; remat per iteration so the
            # backward doesn't hold 16 copies of the activations
            blk = jax.checkpoint(block)

            def body(acc, i):
                y = blk(x_ * (1.0 + i.astype(dtype) * 1e-3), w_)
                return acc + jnp.sum(y.astype(jnp.float32) ** 2), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(REPEATS)
            )
            return acc

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        out = grad_fn(w, x)
        float(jnp.sum(out[0].astype(jnp.float32)))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = grad_fn(w, x)
            float(jnp.sum(out[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        per_layer = ts[len(ts) // 2] * 1000 / REPEATS
        gflop = 2 * s * s * cin * cout * k * k * batch / 1e9 * 3  # fwd+2 bwd
        print(f"{name:24s} {per_layer:8.2f} ms  (~{gflop / per_layer:6.1f} TFLOP/s)")
        total += per_layer
    print(f"{'sum (one enc+dec pass)':24s} {total:8.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
