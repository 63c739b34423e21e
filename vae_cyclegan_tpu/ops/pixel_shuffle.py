"""PixelShuffle / PixelUnshuffle (space-to-depth) for NHWC tensors.

The reference downsamples with ``nn.PixelUnshuffle(2)`` and upsamples with
``nn.PixelShuffle(2)`` (reference: Networks.py:86,121). On TPU these are pure
reshape+transpose; XLA lowers them to layout changes fused with the adjacent
convolution, keeping all FLOPs on the MXU.

Channel convention: the sub-pixel positions are folded as ``(c, s1, s2)``
(channel-major), matching torch's ordering so that
``pixel_shuffle(pixel_unshuffle(x)) == x`` and filter-channel semantics line
up with the reference architecture diagrams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unshuffle_impl(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    # -> (b, h/f, w/f, c, f, f): channel-major (c, s1, s2) like torch
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // f, w // f, c * f * f)


def _shuffle_impl(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    f = factor
    cout = c // (f * f)
    x = x.reshape(b, h, w, cout, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * f, w * f, cout)


# The adjoints run behind optimization barriers ON BOTH SIDES: when the
# downstream consumer is a float32 computation (the InstanceNorm
# backward), XLA hoists its bf16->f32 convert across the adjoint's 6-D
# transpose, so the shuffle copy runs at double width (profiled: ~12
# ms/step of f32[24,256,256,32]-class copies on the flagship). The input
# barrier alone is not enough — XLA still sinks the consumer's convert
# into the transpose it owns (profiled round 3: 8x ~1.4 ms
# f32[24,128,128,32,2,2] transposes + bf16->f32 relayout copies at the
# U4 shuffle sites) — so the output is pinned too.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pixel_unshuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f)."""
    return _unshuffle_impl(x, factor)


def _pinned(impl, f, _res, g):
    out = impl(jax.lax.optimization_barrier(g), f)
    return (jax.lax.optimization_barrier(out),)


pixel_unshuffle.defvjp(
    lambda x, f: (_unshuffle_impl(x, f), None),
    functools.partial(_pinned, _shuffle_impl),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*f, W*f, C/(f*f))."""
    return _shuffle_impl(x, factor)


pixel_shuffle.defvjp(
    lambda x, f: (_shuffle_impl(x, f), None),
    functools.partial(_pinned, _unshuffle_impl),
)
