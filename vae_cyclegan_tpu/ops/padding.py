"""Reflection padding for NHWC tensors.

Every conv in the reference uses ``padding_mode='reflect'``
(reference: Networks.py:60,87,101,122,136,145). XLA convolutions only support
implicit zero padding, so reflection is materialized with ``jnp.pad`` ahead of
a VALID conv; XLA fuses the pad into the surrounding computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the two spatial dims of an NHWC tensor by `pad` pixels."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
