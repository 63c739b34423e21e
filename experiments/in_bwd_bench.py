"""Isolated XLA cost of the fused InstanceNorm+act FORWARD and BACKWARD
at the flagship's big-spatial shapes (slope-corrected timer).

The round-3 step profile attributes ~80-100 ms/step to the IN backward
fusions (convert_element_type / reduce_sum anchors inside CaSb/UBlock/
DBlock scopes) — this pins per-site numbers so a Pallas bwd kernel has
an honest target. Speed-of-light (bf16 in/out, two-pass bwd):
read x+g twice + write dx ~= 5 tensors' traffic.

Usage: python experiments/in_bwd_bench.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.tpu_timer import bench
from vae_cyclegan_tpu.ops.instance_norm import _fused_reference

B = int(os.environ.get("B", "24"))
SHAPES = [
    ("head@256x64", (B, 256, 256, 64)),
    ("U3@128x128", (B, 128, 128, 128)),
    ("D1@128x128", (B, 128, 128, 128)),
    ("U2@64x64", (B, 64, 64, 64)),
]


def main():
    hbm_gbps = 800.0
    for name, shape in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32
                              ).astype(jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32
                              ).astype(jnp.bfloat16)
        nbytes = x.size * 2
        for order in ("act_norm", "norm_act"):
            f = lambda v: _fused_reference(v, "relu", order, 1e-5)
            t_f = bench(f, x)

            def bwd(g_, x_):
                _, vjp = jax.vjp(f, x_)
                (dx,) = vjp(g_)
                return dx

            t_b = bench(bwd, g, x)
            sol_f = 2 * nbytes / hbm_gbps / 1e6      # read + write
            sol_b = 5 * nbytes / hbm_gbps / 1e6      # 2(x+g) reads + write
            print(f"{name:14s} {order:9s} fwd {t_f:7.3f} ms "
                  f"(SOL {sol_f:5.2f})   bwd {t_b:7.3f} ms (SOL {sol_b:5.2f})",
                  flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    main()
