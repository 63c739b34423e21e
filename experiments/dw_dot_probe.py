"""Micro-probe: which dw dot shape is fastest on the v5e MXU for the
k7 starved classes (tail 64->3, head 3->64)?

The production dw kernel (ops/starved_conv._dw_kernel) contracts over
chunk pixels L with (M, N) in {(k*c_t, k*co_g), (k*co_g, k*c_t)} —
both put one spatial factor k in each operand's row group. A third
form puts BOTH k factors on one side: dw[c, (dy,dx,co)] with
P = x rows as-is (c_t rows) and G' = k^2*co_g shifted copies of g,
K growing from L to the padded-x domain Mx ~= 1.38L at R=16.

This probe times ONLY the dots (operands pre-staged in VMEM, same
grid-step count as production) to separate MXU-shape effects from
slab-assembly effects before committing to a kernel rewrite.
"""
import functools, time, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

k, wp, R = 7, 262, 16
L = R * wp            # 4192
Lp = L + k - 1
Mx = (R + k - 1) * wp # 5766

def make(mk, nk, kk, steps):
    def kern(p_ref, g_ref, o_ref, acc):
        s = pl.program_id(0)
        part = jax.lax.dot_general(
            p_ref[...], g_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        @pl.when(s == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)
        acc[...] = acc[...] + part
        @pl.when(s == steps - 1)
        def _():
            o_ref[...] = acc[...]
    f = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((mk, kk), lambda s: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((nk, kk), lambda s: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((mk, nk), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mk, nk), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mk, nk), jnp.float32)],
    )
    return jax.jit(f)

def bench(name, mk, nk, kk, steps=384, iters=20):
    p = jnp.ones((mk, kk), jnp.bfloat16)
    g = jnp.ones((nk, kk), jnp.bfloat16)
    f = make(mk, nk, kk, steps)
    float(f(p, g)[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(p, g)
    float(o[0, 0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} M={mk:4d} N={nk:4d} K={kk:5d} x{steps}: {dt:7.3f} ms")
    return dt

print("backend:", jax.devices()[0].platform)
# current tail-dw swap orientation
bench("tail dw current (21,448,Lp)", 24, 448, Lp)
# non-swap
bench("tail dw nonswap (448,21->24)", 448, 24, Lp)
# wide: M=c_t=64, N=k^2*co_g=147->pad 152 (sublane 8), K=Mx
bench("tail dw wide (64,147,Mx)", 64, 152, Mx)
# head dw mirrored wide: M=co_g=64 (dw[(dy,dx,c),co] -> (co, k^2*c_t))
bench("head dw wide (64,147,Mx)", 64, 152, Mx)
# U4-class k3 for reference: current (3*32=96, 3*64=192)
bench("u4 dw current (96,192)", 96, 192, 16*514+2, steps=24*8)
bench("u4 dw wide (32,9*64=576)", 32, 576, 18*514, steps=24*8)
