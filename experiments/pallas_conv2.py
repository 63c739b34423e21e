#!/usr/bin/env python3
"""Prototype v2: Pallas direct conv for MXU-starved shapes, channels on
SUBLANES (pad-to-8) instead of lanes (pad-to-128).

Layout: x is pre-arranged in XLA to (N, cin_p, Hp*Wp) where Hp = H + 2p
(reflect-padded), Wp = W + 2p rounded up to a lane tile (128), cin_p =
cin rounded to 8. Spatial is flat on lanes, so the tap at (dy, dx) is the
lane offset dy*Wp + dx: dy comes free via overlapping row-slab DMAs
(aligned, since Wp % 128 == 0), dx via an in-register lane roll.

Per grid step (n, y-chunk): k DMAs build patch (k*cin_p, R*Wp); then
acc(cout, R*Wp) += Wdx[dx] @ roll(patch, -dx) for each dx — K = k*cin_p
is dense on sublanes, M = cout, N = R*Wp lanes. f32 accumulation.
"""
from __future__ import annotations

import functools
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_cyclegan_tpu.ops.reflect_conv import _naive_reflect_conv


def _rup(a, m):
    return -(-a // m) * m


def _kernel(xf_ref, w_ref, out_ref, patch, sem, *, k, R, Wp, cin_p, cout):
    n = pl.program_id(0)
    i = pl.program_id(1)
    L = R * Wp
    # slab is L + 128 lanes wide so the dx taps come from (supported)
    # unaligned lane slices instead of (bf16-unsupported) pltpu.roll
    for dy in range(k):
        pltpu.make_async_copy(
            xf_ref.at[n].at[:, pl.ds((i * R + dy) * Wp, L + 128)],
            patch.at[pl.ds(dy * cin_p, cin_p), :],
            sem.at[dy],
        ).start()
    for dy in range(k):
        pltpu.make_async_copy(
            xf_ref.at[n].at[:, pl.ds((i * R + dy) * Wp, L + 128)],
            patch.at[pl.ds(dy * cin_p, cin_p), :],
            sem.at[dy],
        ).wait()
    acc = jnp.zeros((cout, L), jnp.float32)
    p = patch[:]
    for dx in range(k):
        acc = acc + jax.lax.dot_general(
            w_ref[dx], p[:, dx:dx + L],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_ref.dtype)[None]


def prep_x(x, k):
    """NHWC -> (N, cin_p, Hp*Wp) with reflect pad, lane-aligned Wp."""
    n, h, w, cin = x.shape
    p = k // 2
    cin_p = _rup(cin, 8)
    wp = _rup(w + 2 * p, 128)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp - w - 2 * p), (0, cin_p - cin)))
    xf = xp.transpose(0, 3, 1, 2).reshape(n, cin_p, (h + 2 * p) * wp)
    # +128 tail lanes so the last chunk's widened slab DMA stays in range
    return jnp.pad(xf, ((0, 0), (0, 0), (0, 128)))


def prep_w(w, cin_p):
    """(k,k,cin,cout) -> (k_dx, cout, k_dy*cin_p)."""
    k, _, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    # wdx[dx, co, dy*cin_p + ci] = w[dy, dx, ci, co]
    return wp.transpose(1, 3, 0, 2).reshape(k, cout, k * cin_p)


def lowcin_conv(x, w, R=16):
    n, h, wd, cin = x.shape
    k, _, _, cout = w.shape
    p = k // 2
    cin_p = _rup(cin, 8)
    wp = _rup(wd + 2 * p, 128)
    xf = prep_x(x, k)
    wdx = prep_w(w, cin_p).astype(x.dtype)
    kern = functools.partial(
        _kernel, k=k, R=R, Wp=wp, cin_p=cin_p, cout=cout)
    out = pl.pallas_call(
        kern,
        grid=(n, h // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, cout, k * cin_p), lambda ni, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, R * wp), lambda ni, ii: (ni, 0, ii),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout, h * wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((k * cin_p, R * wp + 128), x.dtype),
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )(xf, wdx)
    out = out.reshape(n, cout, h, wp)[:, :, :, :wd]
    return out.transpose(0, 2, 3, 1)


REPEATS = 16


def timeit_scan(fn, x, w):
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
    shapes = [
        ("head k7 3->64 @256", 256, 3, 64, 7, 16),
        ("U3 64->128 @128", 128, 64, 128, 3, 16),
        ("U4 32->64 @256", 256, 32, 64, 3, 16),
        ("tail k7 64->3 @256", 256, 64, 3, 7, 16),
    ]
    print(f"batch={batch} bf16 backend={jax.default_backend()}", flush=True)
    for name, s, cin, cout, k, R in shapes:
        x = jax.random.normal(key, (batch, s, s, cin), dtype)
        w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.05
        want = _naive_reflect_conv(x, w).astype(jnp.float32)
        fn = functools.partial(lowcin_conv, R=R)
        try:
            got = jax.jit(fn)(x, w).astype(jnp.float32)
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} COMPILE FAIL: {str(e)[:160]}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) or 1.0
        t_ref = timeit_scan(_naive_reflect_conv, x, w)
        t_new = timeit_scan(fn, x, w)
        gflop = 2 * s * s * cin * cout * k * k * batch / 1e9
        print(f"{name:20s} relerr={err/scale:.2e}  xla={t_ref:6.2f}ms "
              f"pallas={t_new:6.2f}ms ({gflop/t_new:6.1f} TF/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
