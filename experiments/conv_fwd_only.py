#!/usr/bin/env python3
"""Forward-only timings for conv formulations on the starved shapes."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from vae_cyclegan_tpu.ops.reflect_conv import _naive_reflect_conv

LAYERS = [
    ("head k7 3->64 @256", 256, 3, 64, 7),
    ("U3 64->128 @128", 128, 64, 128, 3),
    ("U4 32->64 @256", 256, 32, 64, 3),
    ("tail k7 64->3 @256", 256, 64, 3, 7),
]


def zero_conv(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col_conv(x, w):
    k, _, cin, cout = w.shape
    p = k // 2
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    taps = [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(k) for dx in range(k)]
    patches = jnp.concatenate(taps, axis=-1)
    return patches @ w.reshape(k * k * cin, cout)


def col2im_conv(x, w):
    k, _, cin, cout = w.shape
    p = k // 2
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    hp, wp = h + 2 * p, wd + 2 * p
    z = (xp.reshape(n, hp * wp, cin)
         @ w.transpose(2, 0, 1, 3).reshape(cin, k * k * cout)
         ).reshape(n, hp, wp, k * k, cout)
    out = jnp.zeros((n, h, wd, cout), z.dtype)
    for dy in range(k):
        for dx in range(k):
            out = out + z[:, dy:dy + h, dx:dx + wd, dy * k + dx, :]
    return out


def f32acc_conv(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


REPEATS = 16


def timeit(fn, x, w):
    dtype = x.dtype

    def scanned(x_, w_):
        def body(acc, i):
            y = fn(x_ * (1.0 + i.astype(dtype) * 1e-3), w_)
            return acc + jnp.sum(y.astype(jnp.float32) ** 2), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(REPEATS))
        return acc

    f = jax.jit(scanned)
    float(f(x, w))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x, w))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1000 / REPEATS


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"batch={batch} bf16 fwd-only backend={jax.default_backend()}", flush=True)
    for (lname, s, cin, cout, k) in LAYERS:
        x = jax.random.normal(key, (batch, s, s, cin), dtype)
        w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05
        gflop = 2 * s * s * cin * cout * k * k * batch / 1e9
        print(lname, flush=True)
        for name, fn in [("reflect naive", _naive_reflect_conv),
                         ("zero conv", zero_conv),
                         ("f32acc conv", f32acc_conv),
                         ("im2col", im2col_conv),
                         ("col2im", col2im_conv)]:
            try:
                ms = timeit(fn, x, w)
                print(f"  {name:14s} {ms:8.2f} ms (~{gflop/ms:6.1f} TF/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:14s} FAILED {str(e)[:90]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
