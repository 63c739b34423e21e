"""Kaiming (He) normal fan_out initializers matching the reference.

Every network in the reference initializes conv weights with
``nn.init.kaiming_normal_(w, mode='fan_out', nonlinearity='relu')`` and zero
biases (reference: Networks.py:168-178); the Discriminator uses
``nonlinearity='leaky_relu', a=0.2`` (Networks.py:255-265). Flax conv kernels
are (kh, kw, cin, cout), so fan_out = cout * kh * kw.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal_fan_out(nonlinearity: str = "relu", a: float = 0.2):
    """Returns a Flax kernel initializer: N(0, gain^2 / fan_out)."""
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = math.sqrt(2.0 / (1.0 + a * a))
    else:
        raise NotImplementedError(f"nonlinearity {nonlinearity}")

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, cout = shape
        fan_out = cout * kh * kw
        std = gain / math.sqrt(fan_out)
        return std * jax.random.normal(key, shape, jnp.float32).astype(dtype)

    return init
