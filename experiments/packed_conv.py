"""Space-to-depth packed convolution for MXU-starved conv shapes.

The model zoo's four slowest layers (measured in experiments/layer_bench.py;
ROADMAP.md) are big-spatial, low-channel, stride-1 reflect-pad convs — the
k7 3->64 head, the k7 64->3 tail, and the U3/U4 upsample convs (cin 32-64).
XLA pads conv channel dims to the 128-lane tile, so cin=3 wastes ~43x of
every MXU pass (measured 3.9-7.4 TFLOP/s vs 60-89 on the well-shaped
D/R stack).

This op reshapes the problem instead of the hardware: pack b x b spatial
blocks into channels (space-to-depth) on both sides of the conv, so a
(H, W, cin) k x k conv becomes an (H/b, W/b, b^2*cin) Th x Tw conv with
b^2*cout outputs — channel counts land on (or near) the 128 lane tile and
the MXU runs dense. The packed weights are a block-Toeplitz rearrangement
of the original kernel with zeros where the receptive field does not reach,
built from the live parameter inside jit (so autodiff flows back to the
original kernel layout and checkpoints/importers are unaffected).

Exactness: out[y, x] = sum_dy,dx w[dy, dx] * xpad[y+dy, x+dx] holds
identically — the packed kernel evaluates the same sums plus zero-weighted
taps. Cost ratio vs the ideal conv is (Th*Tw*b^2)/(kh*kw); the win is that
the MXU stops multiplying 128-lane zero padding:

  head  k7 3->64 @256:  b=2 -> cin 12 (1.31x MACs), b=4 -> 48 (2.9x)
  tail  k7 64->3 @256:  b=2 -> cout 12, b=4 -> cout 48
  U4    k3 32->64 @256: b=2 -> cin 128, cout 256 (1.78x MACs)
  U3    k3 64->128@128: b=2 -> cin 256, cout 512 (1.78x MACs)

Only stride-1, odd-k, pad=k//2 (the generators' only conv shape,
reference Networks.py:57-149) is supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel order (by, bx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of space_to_depth (channel order (by, bx, c))."""
    n, h, w, c = x.shape
    co = c // (b * b)
    x = x.reshape(n, h, w, b, b, co)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * b, w * b, co)


def packed_weights(w: jnp.ndarray, b: int) -> jnp.ndarray:
    """Rearrange (kh, kw, cin, cout) into the packed-space kernel
    (Th, Tw, b^2*cin, b^2*cout).

    For output offset (oy, ox) within a block, the contribution of padded
    input row R = b*t + iy to output row Y = b*P + oy is w[R - Y] — i.e.
    the original kernel shifted by (oy, ox) inside a (b*Th, b*Tw) frame,
    then regrouped into (tap, within-block) axes.
    """
    kh, kw, cin, cout = w.shape
    th, tw = _cdiv(kh + b - 1, b), _cdiv(kw + b - 1, b)
    frame = jnp.zeros((b * th, b * tw, cin, cout), w.dtype)
    per_offset = []
    for oy in range(b):
        row = []
        for ox in range(b):
            a = frame.at[oy : oy + kh, ox : ox + kw].set(w)
            a = a.reshape(th, b, tw, b, cin, cout)
            a = a.transpose(0, 2, 1, 3, 4, 5).reshape(th, tw, b * b * cin, cout)
            row.append(a)
        per_offset.append(jnp.stack(row, axis=3))  # (th, tw, K, b_ox, cout)
    wp = jnp.stack(per_offset, axis=3)  # (th, tw, K, b_oy, b_ox, cout)
    return wp.reshape(th, tw, b * b * cin, b * b * cout)


def packed_reflect_conv(
    x: jnp.ndarray, w: jnp.ndarray, block: int
) -> jnp.ndarray:
    """Reflect-padded SAME conv (stride 1, odd k, pad k//2) computed in
    space-to-depth packed space. Requires H and W divisible by `block`."""
    kh, kw, cin, cout = w.shape
    b = block
    n, h, wd, _ = x.shape
    if h % b or wd % b:
        raise ValueError(f"spatial ({h},{wd}) not divisible by block {b}")
    p_h, p_w = kh // 2, kw // 2
    th, tw = _cdiv(kh + b - 1, b), _cdiv(kw + b - 1, b)
    # reflect by k//2, then zero-fill to the packed tap frame; the fill
    # rows/cols are provably outside every nonzero packed-weight tap
    # (max weighted row = H + 2*(k//2) - 1 for odd k).
    extra_h, extra_w = b * (th - 1) - 2 * p_h, b * (tw - 1) - 2 * p_w
    xp = jnp.pad(
        x, ((0, 0), (p_h, p_h), (p_w, p_w), (0, 0)), mode="reflect"
    )
    if extra_h or extra_w:
        xp = jnp.pad(xp, ((0, 0), (0, extra_h), (0, extra_w), (0, 0)))
    y = jax.lax.conv_general_dilated(
        space_to_depth(xp, b),
        packed_weights(w, b).astype(x.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(y, b)
