"""Reflect-padded convolution (XLA path).

The reference pads with `mode='reflect'` before every conv
(Networks.py:60 etc.). Two rounds of measurement shaped this op:

  * a k3 "strip decomposition" (zero-pad conv + recomputed borders)
    avoided the padded-tensor copy but netted ~0 end-to-end (53.7 vs
    53.8 img/s, ROADMAP.md item 1) while adding 4 extra border convs and
    4 scatter writes per call site to every graph — deleted in round 3;
  * the shapes where reflect padding actually costs (the big-spatial
    MXU-starved convs) are served by the fused Pallas kernels in
    `ops.starved_conv`, which index reflected borders in-kernel for
    free.

So this op is now simply the materialized reflect pad + XLA conv: the
fallback / oracle lowering for every shape the Pallas dispatcher does
not claim, and the reference semantics in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv(x, w, pad_lo=0, pad_hi=0):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1),
        [(pad_lo, pad_hi), (pad_lo, pad_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _naive_reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    half = w.shape[0] // 2
    if half == 0:
        return _conv(x, w)
    xp = jnp.pad(
        x, ((0, 0), (half, half), (half, half), (0, 0)), mode="reflect"
    )
    return _conv(xp, w)


def reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv(reflect_pad(x, k//2), w): NHWC x, (k, k, cin, cout) w with
    odd k, stride 1, 'same' output size."""
    return _naive_reflect_conv(x, w)
