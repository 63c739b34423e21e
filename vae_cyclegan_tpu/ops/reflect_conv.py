"""Reflect-padded convolution without materializing the padded tensor.

`jnp.pad(mode='reflect')` before every conv (the reference pattern,
Networks.py:60 etc.) costs a full copy of the padded tensor per layer —
profiled at ~27% of the cyclevaegan step (layout copies + pad-gradient
slice-adds). This op keeps reflect semantics exactly while avoiding the
copy:

  1. run the conv with XLA's native zero padding (no materialization);
  2. recompute ONLY the half=k//2-wide output border from small reflected
     strips and write it back with `.at[].set()` (fuses in-place).

Valid for odd kernels, stride 1, padding k//2 — every generator conv in the
model zoo. Exact: verified bit-identical to the padded conv in f32.
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


def _reflect_w(s: jnp.ndarray, half: int) -> jnp.ndarray:
    """Reflect-pad a strip along the width axis by `half`."""
    return jnp.concatenate(
        [s[:, :, half:0:-1], s, s[:, :, -2:-2 - half:-1]], axis=2
    )


def _reflect_h(s: jnp.ndarray, half: int) -> jnp.ndarray:
    return jnp.concatenate(
        [s[:, half:0:-1], s, s[:, -2:-2 - half:-1]], axis=1
    )


def _naive_reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    half = w.shape[0] // 2
    xp = jnp.pad(
        x, ((0, 0), (half, half), (half, half), (0, 0)), mode="reflect"
    )
    return _conv(xp, w)


def reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv(reflect_pad(x, k//2), w) without the pad copy.

    x: NHWC; w: (k, k, cin, cout) with odd k; stride 1, 'same' output size.
    Only k == 3 uses the strip decomposition (20 of the 22 convs per
    generator): the TPU fusion emitter crashes lowering wide-kernel border
    strips (jellyfish ReverseInput window/pad checks fail for k=7 strips),
    so larger kernels keep the classic materialized reflect pad.
    """
    k = w.shape[0]
    half = k // 2
    if half == 0:
        return _conv(x, w)
    _, h, width, _ = x.shape
    if k != 3 or h < 2 * half + 1 or width < 2 * half + 1:
        return _naive_reflect_conv(x, w)
    return _strip_reflect_conv(x, w)


def _strip_reflect_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    k = w.shape[0]
    half = k // 2
    _, h, width, _ = x.shape

    out = _conv(x, w, half, half)

    # horizontal border strips: padded rows [-half, 2half-1] (top) and
    # [H-2half, H-1+half] (bottom) produce output rows [0, half) / [H-half, H)
    top_in = jnp.concatenate([x[:, half:0:-1], x[:, 0:2 * half]], axis=1)
    bot_in = jnp.concatenate(
        [x[:, h - 2 * half:], x[:, -2:-2 - half:-1]], axis=1
    )
    top = _conv(_reflect_w(top_in, half), w)
    bot = _conv(_reflect_w(bot_in, half), w)
    out = out.at[:, :half].set(top)
    out = out.at[:, h - half:].set(bot)

    # vertical border strips, with FULL vertical reflect pad so the four
    # corners come out exactly right
    left_in = jnp.concatenate([x[:, :, half:0:-1], x[:, :, 0:2 * half]], axis=2)
    right_in = jnp.concatenate(
        [x[:, :, width - 2 * half:], x[:, :, -2:-2 - half:-1]], axis=2
    )
    left = _conv(_reflect_h(left_in, half), w)
    right = _conv(_reflect_h(right_in, half), w)
    out = out.at[:, :, :half].set(left)
    out = out.at[:, :, width - half:].set(right)
    return out
