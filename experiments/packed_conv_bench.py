#!/usr/bin/env python3
"""Packed-conv candidate bench: the four MXU-starved layers (ROADMAP.md),
current reflect_conv path vs packed_reflect_conv at b in {2,4,8}.
fwd+bwd, scan-amortized like layer_bench.py. Run on TPU."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from vae_cyclegan_tpu.ops import instance_norm_act
from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv
from packed_conv import packed_reflect_conv

LAYERS = [
    ("head k7 3->64 @256", 256, 3, 64, 7, "norm_act"),
    ("U3 64->128 @128", 128, 64, 128, 3, "act_norm"),
    ("U4 32->64 @256", 256, 32, 64, 3, "act_norm"),
    ("tail k7 64->3 @256", 256, 64, 3, 7, "none"),
]
REPEATS = 16

def bench(conv_fn, name, s, cin, cout, k, order, batch, dtype):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, s, s, cin), dtype)
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05
    def block(x_, w_):
        y = conv_fn(x_, w_)
        if order == "none":
            return y
        return instance_norm_act(y, act="relu", order=order)
    def loss(w_, x_):
        blk = jax.checkpoint(block)
        def body(acc, i):
            y = blk(x_ * (1.0 + i.astype(dtype) * 1e-3), w_)
            return acc + jnp.sum(y.astype(jnp.float32) ** 2), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(REPEATS))
        return acc
    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    out = grad_fn(w, x); float(jnp.sum(out[0].astype(jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = grad_fn(w, x)
        float(jnp.sum(out[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = ts[len(ts)//2] * 1000 / REPEATS
    gflop = 2 * s * s * cin * cout * k * k * batch / 1e9 * 3
    print(f"  {name:14s} {ms:8.2f} ms  (~{gflop/ms:6.1f} TFLOP/s true)", flush=True)
    return ms

def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dtype = jnp.bfloat16
    print(f"batch={batch} bf16 backend={jax.default_backend()}", flush=True)
    for (lname, s, cin, cout, k, order) in LAYERS:
        print(lname, flush=True)
        bench(reflect_conv, "reflect(cur)", s, cin, cout, k, order, batch, dtype)
        for b in (2, 4, 8):
            if s % b: continue
            bench(lambda x_, w_, b=b: packed_reflect_conv(x_, w_, b),
                  f"packed b={b}", s, cin, cout, k, order, batch, dtype)
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
