"""TPU correctness + timing for the fused starved-conv kernels (round 3).

Shapes: the four production starved sites (ROADMAP per-layer table):
head k7 3->64 @256, U4 k3 32->64 @256, tail k7 64->3 @256.

Usage: python experiments/starved_fused_bench.py [check|fwd|grad|all]
Env: B (batch, default 24), DT (bf16|f32).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.tpu_timer import bench, bench_grad
from vae_cyclegan_tpu.ops import starved_conv as sc
from vae_cyclegan_tpu.ops.reflect_conv import _naive_reflect_conv

B = int(os.environ.get("B", "24"))
DT = jnp.bfloat16 if os.environ.get("DT", "bf16") == "bf16" else jnp.float32

SHAPES = [
    ("head", 256, 3, 64, 7),
    ("U4", 256, 32, 64, 3),
    ("tail", 256, 64, 3, 7),
]


def data(hw, cin, cout, k, batch):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (batch, hw, hw, cin), jnp.float32).astype(DT)
    w = (jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * 0.05
         ).astype(DT)
    return x, w


def check():
    for name, hw, cin, cout, k in SHAPES:
        x, w = data(hw, cin, cout, k, 2)
        got = jax.jit(sc._starved_conv)(x, w)
        want = jax.jit(_naive_reflect_conv)(x, w)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
        print(f"check fwd {name}: max abs err {err:.3e} (rel {err/scale:.3e})",
              flush=True)

        cot = jax.random.normal(jax.random.PRNGKey(2), got.shape,
                                jnp.float32).astype(DT)

        def loss(fn, a, b, _cot=cot):
            return jnp.sum((fn(a, b) * _cot).astype(jnp.float32))

        gx_r, gw_r = jax.jit(jax.grad(
            lambda a, b: loss(_naive_reflect_conv, a, b), (0, 1)))(x, w)
        gx_n, gw_n = jax.jit(jax.grad(
            lambda a, b: loss(sc._starved_conv, a, b), (0, 1)))(x, w)
        ex = float(jnp.max(jnp.abs(gx_r.astype(jnp.float32)
                                   - gx_n.astype(jnp.float32))))
        ew = float(jnp.max(jnp.abs(gw_r.astype(jnp.float32)
                                   - gw_n.astype(jnp.float32))))
        sx = float(jnp.max(jnp.abs(gx_r.astype(jnp.float32)))) or 1.0
        sw = float(jnp.max(jnp.abs(gw_r.astype(jnp.float32)))) or 1.0
        print(f"check grad {name}: dx rel {ex/sx:.3e}  dw rel {ew/sw:.3e}",
              flush=True)


def fwd():
    for name, hw, cin, cout, k in SHAPES:
        x, w = data(hw, cin, cout, k, B)
        t_k = bench(sc._starved_conv, x, w, narrow=True)
        t_x = bench(_naive_reflect_conv, x, w, narrow=False)
        print(f"fwd {name}: kernel {t_k:.3f} ms  xla {t_x:.3f} ms  "
              f"({t_x / t_k:.2f}x)", flush=True)


def grad():
    # r2 kept small: the scan-grad harness stores one output copy per
    # iteration for the XLA oracle (r2=64 at cout=64 would need 26 GB)
    for name, hw, cin, cout, k in SHAPES:
        x, w = data(hw, cin, cout, k, B)
        t_k = bench_grad(sc._starved_conv, x, w, r1=8, r2=24)
        t_x = bench_grad(_naive_reflect_conv, x, w, r1=8, r2=24)
        print(f"fwd+bwd {name}: kernel {t_k:.3f} ms  xla {t_x:.3f} ms  "
              f"({t_x / t_k:.2f}x)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()} batch={B} dtype={DT.__name__}",
          flush=True)
    if mode in ("check", "all"):
        check()
    if mode in ("fwd", "all"):
        fwd()
    if mode in ("grad", "all"):
        grad()
