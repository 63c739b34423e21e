"""Reproduce the in-context InstanceNorm-backward blowup.

The step profile shows the head IN backward at ~5.8 ms (autoencoder,
CaSb_0 convert anchor) while the isolated IN VJP measures 1.9 ms. This
times grad through small chains to find which composition triggers it.

Usage: python experiments/in_chain_bench.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.tpu_timer import bench
from vae_cyclegan_tpu.ops.instance_norm import (
    _fused_reference,
    _fused_xla,
)
from vae_cyclegan_tpu.ops.starved_conv import starved_reflect_conv

B = int(os.environ.get("B", "24"))


def timed_grad(f, *args):
    def run(x, *rest):
        def loss(v):
            return jnp.sum(f(v, *rest).astype(jnp.float32) ** 2)
        return jax.grad(loss)(x)
    return bench(run, *args)


def main():
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, 256, 256, 3), jnp.float32
                          ).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (7, 7, 3, 64), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    y = jax.random.normal(kg, (B, 256, 256, 64), jnp.float32
                          ).astype(jnp.bfloat16)

    # 1. IN alone (both lowerings)
    t_ref = timed_grad(lambda v: _fused_reference(v, "relu", "norm_act",
                                                  1e-5), y)
    t_xla = timed_grad(lambda v: _fused_xla(v, "relu", "norm_act", 1e-5,
                                            (1, 2)), y)
    print(f"IN alone        autodiff {t_ref:7.3f} ms   custom {t_xla:7.3f} ms",
          flush=True)

    # 2. conv -> IN chain (the CaSb head)
    t_ref = timed_grad(
        lambda v, w_: _fused_reference(starved_reflect_conv(v, w_),
                                       "relu", "norm_act", 1e-5), x, w)
    t_xla = timed_grad(
        lambda v, w_: _fused_xla(starved_reflect_conv(v, w_),
                                 "relu", "norm_act", 1e-5, (1, 2)), x, w)
    print(f"conv+IN chain   autodiff {t_ref:7.3f} ms   custom {t_xla:7.3f} ms",
          flush=True)

    # 3. conv -> IN -> consumer-conv (adds a real gradient consumer)
    kw2 = jax.random.PRNGKey(9)
    w2 = (jax.random.normal(kw2, (3, 3, 64, 64), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)

    def chain(v, w_, w2_, in_op):
        h = in_op(starved_reflect_conv(v, w_))
        return starved_reflect_conv(h, w2_)

    t_ref = timed_grad(
        lambda v, w_, w2_: chain(
            v, w_, w2_,
            lambda u: _fused_reference(u, "relu", "norm_act", 1e-5)),
        x, w, w2)
    t_xla = timed_grad(
        lambda v, w_, w2_: chain(
            v, w_, w2_,
            lambda u: _fused_xla(u, "relu", "norm_act", 1e-5, (1, 2))),
        x, w, w2)
    print(f"conv+IN+conv    autodiff {t_ref:7.3f} ms   custom {t_xla:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    main()
