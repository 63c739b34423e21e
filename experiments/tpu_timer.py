"""Slope-based TPU micro-timer.

The axon tunnel adds a ~25-30ms RPC roundtrip per host sync, so naive
(total / REPEATS) timings carry a floor of roundtrip/REPEATS — at
REPEATS=16 that is ~1.7ms, which silently dominated sub-ms kernels.
Measuring the same scan at two REPEAT counts and taking the slope
    t = (T(r2)*r2 - T(r1)*r1) / (r2 - r1)
cancels the roundtrip exactly.

Consumption note: reductions of XLA ops can be *narrowed* (XLA slices
computations backward through `y[0,0]`), so callers must consume the
full output (default: f32 sum) unless the timed fn is an opaque
pallas_call, where `narrow=True` (sum of y[0,0]) is cheaper and safe.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench(fn, *args, r1=64, r2=256, narrow=False, trials=7):
    """Median per-call ms of `fn(*args)` with RPC slope correction.

    fn must be jit-compatible; args[0] is perturbed per iteration to
    defeat loop-invariant hoisting.
    """
    dtype = args[0].dtype

    def scanned(reps):
        def run(*a):
            def body(acc, i):
                y = fn(a[0] * (1.0 + i.astype(dtype) * 1e-3), *a[1:])
                if narrow:
                    val = jnp.sum(y[(0,) * (y.ndim - 1)].astype(jnp.float32))
                else:
                    val = jnp.sum(y.astype(jnp.float32))
                return acc + val, None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return acc
        return jax.jit(run)

    totals = []
    for reps in (r1, r2):
        g = scanned(reps)
        float(g(*args))
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(g(*args))
            ts.append(time.perf_counter() - t0)
        totals.append(min(ts))
    return (totals[1] - totals[0]) / (r2 - r1) * 1000


def bench_grad(fn, x, w, r1=16, r2=64, trials=7):
    """fwd+bwd ms via slope method; consumes grads fully."""
    dtype = x.dtype

    def scanned(reps):
        blk = jax.checkpoint(fn)

        def loss(w_, x_):
            def body(acc, i):
                y = blk(x_ * (1.0 + i.astype(dtype) * 1e-3), w_)
                return acc + jnp.sum(y.astype(jnp.float32) ** 2), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return acc
        g = jax.grad(loss, argnums=(0, 1))
        def run(w_, x_):
            gw, gx = g(w_, x_)
            return (jnp.sum(gw.astype(jnp.float32))
                    + jnp.sum(gx[0, 0].astype(jnp.float32)))
        return jax.jit(run)

    totals = []
    for reps in (r1, r2):
        g = scanned(reps)
        float(g(w, x))
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(g(w, x))
            ts.append(time.perf_counter() - t0)
        totals.append(min(ts))
    return (totals[1] - totals[0]) / (r2 - r1) * 1000
