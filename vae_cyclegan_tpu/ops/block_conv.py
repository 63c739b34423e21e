"""Resampling-conv equivalences: D/U blocks without pixel-(un)shuffle.

The reference's down/up blocks are ``PixelUnshuffle(2) -> conv3x3`` and
``PixelShuffle(2) -> conv3x3`` (reference: Networks.py:83-96, 118-131).
On TPU the shuffles lower to 6-D reshape+transpose copies that XLA
materializes at ~6x the speed-of-light copy cost; round-3 HLO profiling
of the autoencoder step attributed ~59 of 95 ms/step to these and the
layout flips they pin (ROADMAP item 4).  Both compositions are exactly a
single dense convolution on the *unshuffled* grid:

  down2:  conv3(unshuffle2(x))  ==  conv6x6/stride2(coarse_mirror2(x))
          with  w6[2dy+s1, 2dx+s2, c, f] = w3[dy, dx, (c,s1,s2), f]
          — identical MACs: the 36 taps ARE the 9 taps x 4 sub-pixel
          phases; the reference's reflect pad happens on the coarse
          (post-unshuffle) grid, which is a 2-pixel block-mirror on the
          fine grid.

  up2:    conv3(shuffle2(x))    ==  interleave(4 phase convs k2x2)
          — built, exactness-tested, and RETIRED (round 5): despite a
          1.2-1.8x isolated fwd+bwd win it LOSES composed at every site
          split (autoencoder 240-267 vs 276.5 img/s down-only) because
          the output interleave is a 6-D transpose copy per site and it
          displaces the starved-conv channel-major U4 chain. Code in
          git history (commit b287a35:vae_cyclegan_tpu/ops/block_conv.py).

The down2 form is a bit-exact reformulation (values and gradients follow
by linearity); verified against the shuffle+conv lowering in
tests/test_block_conv.py and measured faster fwd+bwd at every production
D shape in isolation (experiments/block_forms.py, v5e) AND composed
(autoencoder 246.2 -> 276.5 img/s, flagship 55.8 -> 65.6 at round 3).

Weights stay stored in the reference layout ``(3, 3, cin, f)`` so
checkpoints and the torch importer are unaffected; the remap to the
dense form is a few-KB reshape/einsum per call that XLA constant-folds
into the step's weight-processing prologue.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def forms_enabled(direction: str) -> bool:
    """Env gate for the down2 form: VCT_BLOCK_FORMS=0 (or
    VCT_BLOCK_FORMS_DOWN=0) opts out for A/Bs. Default ON — the
    composed-step A/B on v5e wins at every scale (see module docstring).
    The up2 form was retired (measured composed loss); only 'down'
    remains."""
    assert direction == "down", "up2 form retired (round 5)"
    master = os.environ.get("VCT_BLOCK_FORMS", "1")
    return os.environ.get("VCT_BLOCK_FORMS_DOWN", master) != "0"


def _conv(x, w, strides=(1, 1), padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ---------------------------------------------------------------------------
# down2: conv3x3(pixel_unshuffle(x)) as one strided 6x6 conv
# ---------------------------------------------------------------------------


def _w6_from_w3(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 4c, f) on the coarse grid -> (6, 6, c, f) on the fine grid.

    Coarse channel block order is (c, s1, s2) (torch PixelUnshuffle,
    ops/pixel_shuffle.py): coarse tap (dy, dx) channel (c, s1, s2) reads
    fine pixel (2dy + s1, 2dx + s2) of fine channel c.
    """
    k, _, cin4, f = w3.shape
    c = cin4 // 4
    w = w3.reshape(k, k, c, 2, 2, f)  # (dy, dx, c, s1, s2, f)
    w = w.transpose(0, 3, 1, 4, 2, 5)  # (dy, s1, dx, s2, c, f)
    return w.reshape(2 * k, 2 * k, c, f)


def _coarse_mirror2(x: jnp.ndarray) -> jnp.ndarray:
    """Reflect pad of ONE coarse pixel, expressed on the fine NHWC grid:
    the coarse reflect row -1 is coarse row 1 = fine rows (2, 3)."""
    x = jnp.concatenate([x[:, 2:4], x, x[:, -4:-2]], axis=1)
    return jnp.concatenate([x[:, :, 2:4], x, x[:, :, -4:-2]], axis=2)


def down2_applicable(fine_shape) -> bool:
    _, h, w, _ = fine_shape
    return forms_enabled("down") and h >= 4 and w >= 4 and h % 2 == 0 and w % 2 == 0


def down2_conv(x: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """== reflect_conv(pixel_unshuffle(x, 2), w3); x fine NHWC,
    w3 (3, 3, 4c, f).

    The backward stays on XLA autodiff deliberately: a custom VJP
    computing dx in the coarse (unshuffled) domain — dense k3 full
    correlation + reflect fold + bf16 pixel-shuffle — measured 61.4 vs
    65.9 img/s on the flagship (round 3), losing to XLA's input-dilated
    ReverseInput fusion of the w6/stride-2 form.

    A channel-major variant (VCT_HEAD_CM: the encoder head -> IN ->
    down2 chain staying (N, H, C, W) end to end, this conv consuming it
    via NHCW dimension numbers) was built, exactness-tested, and A/B'd
    on v5e in round 5: a wash (70.48 vs 70.51 img/s, 3x interleaved
    fresh-process) — the head boundary transpose it elides was already
    hidden under DMA. Retired; code in git history at 6eede58."""
    w6 = _w6_from_w3(w3).astype(x.dtype)
    return _conv(_coarse_mirror2(x), w6, (2, 2))
