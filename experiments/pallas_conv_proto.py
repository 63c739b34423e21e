#!/usr/bin/env python3
"""Prototype: Pallas direct conv (stride-1 SAME reflect) for the four
MXU-starved layer shapes. Forward only — measure before building VJPs.

Design (v2): the image is reflect-padded in XLA and laid out flat as
(N, Hp, Wp*cin) so HBM stays lane-dense and row-slab DMAs are aligned.
Per row-chunk the kernel does ONE lane->sublane relayout to
(rows*Wp, cin); every (dy, dx) tap is then a CONTIGUOUS sublane slice
(offset dy*Wp + dx) — free — and the im2col concat along lanes yields
dense-K patches for one MXU matmul per chunk. Outputs include 2p garbage
columns per row (wrap-around taps), sliced off in XLA (fuses downstream).
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv


def _kernel(xf_ref, w_ref, out_ref, slab, sem, *, k, p, R, Wp, cin, cout):
    n = pl.program_id(0)
    i = pl.program_id(1)
    rows = R + 2 * p + 1  # +1: last row's taps wrap into the next row
    pltpu.make_async_copy(
        xf_ref.at[n].at[pl.ds(i * R, rows)], slab, sem
    ).start()
    pltpu.make_async_copy(
        xf_ref.at[n].at[pl.ds(i * R, rows)], slab, sem
    ).wait()
    x2 = slab[:].reshape(rows * Wp, cin)  # one lane->sublane relayout
    taps = [
        x2[dy * Wp + dx : dy * Wp + dx + R * Wp, :]
        for dy in range(k)
        for dx in range(k)
    ]
    patches = jnp.concatenate(taps, axis=-1)  # (R*Wp, k*k*cin)
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(1, R, Wp, cout).astype(out_ref.dtype)


def pallas_reflect_conv_fwd(x, w, R=32):
    n, h, wd, cin = x.shape
    k, _, _, cout = w.shape
    p = k // 2
    wp = wd + 2 * p
    xp = jnp.pad(
        x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"
    )
    # one extra zero row so every chunk can DMA R + 2p + 1 rows (the last
    # output row's wrap-around taps read k-2 elements past the slab)
    xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 0), (0, 0)))
    xp = xp.reshape(n, h + 2 * p + 1, wp * cin)
    w_mat = w.reshape(k * k * cin, cout)
    kern = functools.partial(
        _kernel, k=k, p=p, R=R, Wp=wp, cin=cin, cout=cout
    )
    out = pl.pallas_call(
        kern,
        grid=(n, h // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (k * k * cin, cout),
                lambda ni, ii: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, wp, cout), lambda ni, ii: (ni, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * p + 1, wp * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w_mat)
    return out[:, :, :wd, :]


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[..., 0].astype(jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out[..., 0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / n)
    ts.sort()
    return ts[len(ts) // 2] * 1000


def main():
    key = jax.random.PRNGKey(0)
    B = 24
    shapes = [
        ("head k7 3->64 @256", 256, 3, 64, 7, 16),
        ("U3 64->128 @128", 128, 64, 128, 3, 32),
        ("U4 32->64 @256", 256, 32, 64, 3, 32),
        ("tail k7 64->3 @256", 256, 64, 3, 7, 8),
    ]
    for name, s, cin, cout, k, R in shapes:
        x = jax.random.normal(key, (B, s, s, cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * 0.05
        want = reflect_conv(x, w)
        f = jax.jit(functools.partial(pallas_reflect_conv_fwd, R=R))
        got = f(x, w)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        t_cur = timeit(jax.jit(reflect_conv), x, w)
        t_new = timeit(f, x, w)
        gflop = 2 * s * s * cin * cout * k * k * B / 1e9
        print(f"{name:20s} err={err:.2e}  cur={t_cur:6.2f}ms "
              f"pallas={t_new:6.2f}ms  ({gflop/t_new:6.1f} TF/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
