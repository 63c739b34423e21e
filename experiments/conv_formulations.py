#!/usr/bin/env python3
"""Measure XLA-level reformulations of the four MXU-starved conv layers
(ROADMAP.md): current reflect_conv vs zero-pad vs im2col+matmul vs
1x1-matmul+col2im. fwd+bwd, scan-amortized like layer_bench.py. Run on TPU.

The starvation mechanism differs per layer:
  head  k7  3->64 @256: cin=3 pads to 128 lanes in the contraction (43x)
  tail  k7 64->3  @256: cout=3 pads to 128 in the matmul N dim (43x)
  U3/U4 k3 low-ch     : moderate padding both sides
im2col makes K dense (k*k*cin); col2im makes N dense (k*k*cout).
"""
import functools
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv, _naive_reflect_conv

LAYERS = [
    ("head k7 3->64 @256", 256, 3, 64, 7),
    ("U3 64->128 @128", 128, 64, 128, 3),
    ("U4 32->64 @256", 256, 32, 64, 3),
    ("tail k7 64->3 @256", 256, 64, 3, 7),
]
REPEATS = 16


def zero_conv(x, w):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col_conv(x, w, reflect=True):
    """Materialize dense (k*k*cin) patches, then one well-shaped matmul."""
    k, _, cin, cout = w.shape
    p = k // 2
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                 mode="reflect" if reflect else "constant")
    taps = [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(k) for dx in range(k)]
    patches = jnp.concatenate(taps, axis=-1)
    return patches @ w.transpose(0, 1, 2, 3).reshape(k * k * cin, cout)


def col2im_conv(x, w, reflect=True):
    """1x1 matmul to (k*k*cout) then fold shifted slices (dense N dim)."""
    k, _, cin, cout = w.shape
    p = k // 2
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                 mode="reflect" if reflect else "constant")
    z = (
        xp.reshape(n, (h + 2 * p) * (wd + 2 * p), cin)
        @ w.transpose(2, 0, 1, 3).reshape(cin, k * k * cout)
    ).reshape(n, h + 2 * p, wd + 2 * p, k, k, cout)
    out = jnp.zeros((n, h, wd, cout), z.dtype)
    for dy in range(k):
        for dx in range(k):
            out = out + z[:, dy:dy + h, dx:dx + wd, dy, dx, :]
    return out


def bench(conv_fn, name, s, cin, cout, k, batch, dtype):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, s, s, cin), dtype)
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05
    want = _naive_reflect_conv(x, w)
    got = jax.jit(conv_fn)(x, w)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    def loss(w_, x_):
        blk = jax.checkpoint(conv_fn)
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
    ms = ts[len(ts) // 2] * 1000 / REPEATS
    gflop = 2 * s * s * cin * cout * k * k * batch / 1e9 * 3
    print(f"  {name:18s} {ms:8.2f} ms (~{gflop/ms:6.1f} TF/s)  err={err:.2e}",
          flush=True)
    return ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dtype = jnp.bfloat16
    print(f"batch={batch} bf16 backend={jax.default_backend()}", flush=True)
    for (lname, s, cin, cout, k) in LAYERS:
        print(lname, flush=True)
        bench(reflect_conv, "reflect(cur)", s, cin, cout, k, batch, dtype)
        bench(zero_conv, "zero-pad bound", s, cin, cout, k, batch, dtype)
        bench(im2col_conv, "im2col reflect", s, cin, cout, k, batch, dtype)
        bench(col2im_conv, "col2im reflect", s, cin, cout, k, batch, dtype)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
