#!/usr/bin/env python3
"""Loss-reduction formulations: XLA upcast-reduce vs MXU dot-with-ones.

ROADMAP item 3: ~42 ms of the 453 ms flagship step is f32 reduction
traffic — XLA upcasts full bf16 tensors to f32 before reducing. The MXU
natively accumulates bf16 x bf16 into f32, so `sum(x) = ones @ x2d @ ones`
reads bf16 straight from HBM with no upcast materialization, and XLA can
fuse the elementwise |a-b| producer into the dot operand.

Run on TPU: python experiments/reduction_bench.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
from tpu_timer import bench


def l1_xla(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def l1_bf16_reduce(a, b):
    # reduce in bf16-input form; XLA still upcasts per-element internally
    return jnp.mean(jnp.abs(a - b).astype(jnp.float32))


def l1_dot(a, b):
    d = jnp.abs(a - b)
    flat = d.reshape(-1, 128)
    col = jax.lax.dot_general(  # (M, 128) . (M,) -> (128,) f32
        flat, jnp.ones((flat.shape[0],), d.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(col) / d.size


def mse_xla(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def mse_dot(a, b):
    d = (a - b).reshape(-1, 128)
    col = jax.lax.dot_general(
        d * d, jnp.ones((d.shape[0],), a.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(col) / d.size


def main():
    key = jax.random.PRNGKey(0)
    for (name, shape) in [("img3", (24, 256, 256, 3)),
                          ("feat64", (24, 256, 256, 64)),
                          ("feat1024", (24, 16, 16, 1024))]:
        a = jax.random.normal(key, shape, jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
        ref = float(l1_xla(a, b))
        for fname, fn in [("l1_xla", l1_xla), ("l1_bf16r", l1_bf16_reduce),
                          ("l1_dot", l1_dot), ("mse_xla", mse_xla),
                          ("mse_dot", mse_dot)]:
            val = float(jax.jit(fn)(a, b))
            ms = bench(fn, a, b)
            print(f"{name:9s} {fname:9s} {ms:7.3f} ms  val={val:.5f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
