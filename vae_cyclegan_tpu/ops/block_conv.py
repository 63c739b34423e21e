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
          — each output fine-grid phase (rho, sigma) sees a 2x2 coarse
          window whose kernel gathers the w3 taps that land on that
          phase; 1.78x the MACs but on dense (4c)-channel inputs, and
          the pre-shuffle copy disappears (the cheap post-interleave of
          the *output* remains).  The reference's reflect pad happens on
          the fine (post-shuffle) grid: fine row -1 == fine row 1, i.e.
          a one-coarse-row pad whose (c, s1, s2) channel blocks gather
          from coarse rows 0 and 1 with the s1 phase mirrored.

Both forms are bit-exact reformulations (values and gradients follow by
linearity); verified against the shuffle+conv lowering in
tests/test_block_conv.py and measured 1.2-1.8x faster fwd+bwd at every
production D/U shape in isolation (experiments/block_forms.py, v5e).
Composed into the full step only down2 survives: the autoencoder e2e
A/B measured 246.2 img/s (off/off) vs 240.3 (on/on) vs **276.5 (down
only)** because up2's output interleave and its displacement of the
starved-conv channel-major U4 chain give back the isolated win — hence
the per-direction defaults in `forms_enabled`.

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
    """Env gate: VCT_BLOCK_FORMS=0/1 masters both directions;
    VCT_BLOCK_FORMS_DOWN / VCT_BLOCK_FORMS_UP override per direction
    (the UP knob also accepts 'cm'/'nocm', see `up2_applicable`).
    Defaults reflect the composed-step A/B on v5e (bench.py,
    BENCH_ARCH=autoencoder): the down2 form wins (D sites have no Pallas
    path to displace) and ships ON; the up2 form loses end-to-end —
    its output interleave re-introduces the transpose the isolated
    layer bench doesn't see — so it ships OFF."""
    master = os.environ.get("VCT_BLOCK_FORMS")
    default = {"down": "1", "up": "0"}[direction] if master is None else master
    return os.environ.get(f"VCT_BLOCK_FORMS_{direction.upper()}", default) != "0"


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


def _coarse_mirror2(x: jnp.ndarray, w_axis: int = 2) -> jnp.ndarray:
    """Reflect pad of ONE coarse pixel, expressed on the fine grid: the
    coarse reflect row -1 is coarse row 1 = fine rows (2, 3). H is
    always axis 1; w_axis=2 is NHWC, w_axis=3 is channel-major
    (N, H, C, W) — anything else is a caller bug, not a layout."""
    if w_axis not in (2, 3):
        raise ValueError(f"w_axis must be 2 (NHWC) or 3 (NHCW), got {w_axis}")
    x = jnp.concatenate([x[:, 2:4], x, x[:, -4:-2]], axis=1)
    if w_axis == 3:
        return jnp.concatenate([x[..., 2:4], x, x[..., -4:-2]], axis=3)
    return jnp.concatenate([x[:, :, 2:4], x, x[:, :, -4:-2]], axis=2)


def down2_applicable(fine_shape) -> bool:
    _, h, w, _ = fine_shape
    return forms_enabled("down") and h >= 4 and w >= 4 and h % 2 == 0 and w % 2 == 0


def head_cm_enabled() -> bool:
    """VCT_HEAD_CM gates the encoder head->IN->down2 channel-major
    handover (head starved-conv emits (N, H, C, W), InstanceNorm rides
    the layout, down2 consumes it via NHCW dimension numbers), eliding
    the head boundary transpose from the graph. Default OFF pending the
    composed-step A/B on v5e."""
    return os.environ.get("VCT_HEAD_CM", "0") == "1"


def head_down2_handover(x_shape, features: int, kernel_size: int,
                        dtype) -> bool:
    """True iff the head CaSb(k=kernel_size) -> IN -> DBlock(down2) chain
    stays channel-major end to end for input `x_shape` (NHWC): the head
    conv engages the Pallas cm path (ReflectConv dispatch: same-conv +
    `cm_engaged`) AND the following down2 block-conv form applies to the
    head's output. Single source of truth shared by Encoder (the
    prediction that sets cm_out/cm_in) and exercised against ReflectConv's
    actual dispatch in tests/test_starved_conv.py — if the dispatch
    conditions change, the two can't silently desync."""
    from vae_cyclegan_tpu.ops.starved_conv import cm_engaged

    n, h, w, cin = x_shape
    return (
        head_cm_enabled()
        and cm_engaged(x_shape, (kernel_size, kernel_size, cin, features),
                       dtype)
        and down2_applicable((n, h, w, features))
    )


def down2_conv(x: jnp.ndarray, w3: jnp.ndarray,
               cm_in: bool = False) -> jnp.ndarray:
    """== reflect_conv(pixel_unshuffle(x, 2), w3); x fine NHWC,
    w3 (3, 3, 4c, f).  cm_in: x arrives channel-major (N, H, C, W) from
    an adjacent starved-conv site; the conv consumes it directly via
    ("NHCW", "HWIO", "NHWC") dimension numbers, so the logical boundary
    transpose never appears in the graph (any physical relayout folds
    into the mirror-pad concatenate XLA materializes anyway). Output is
    NHWC either way (the following D2..D4 sites are XLA convs).

    The backward stays on XLA autodiff deliberately: a custom VJP
    computing dx in the coarse (unshuffled) domain — dense k3 full
    correlation + reflect fold + bf16 pixel-shuffle — measured 61.4 vs
    65.9 img/s on the flagship (round 3), losing to XLA's input-dilated
    ReverseInput fusion of the w6/stride-2 form."""
    w6 = _w6_from_w3(w3).astype(x.dtype)
    if cm_in:
        return jax.lax.conv_general_dilated(
            _coarse_mirror2(x, w_axis=3), w6, (2, 2), "VALID",
            dimension_numbers=("NHCW", "HWIO", "NHWC"),
        )
    return _conv(_coarse_mirror2(x), w6, (2, 2))


# ---------------------------------------------------------------------------
# up2: conv3x3(pixel_shuffle(x)) as 4 dense k2x2 phase convs + interleave
# ---------------------------------------------------------------------------


def _phase_map(k: int = 3) -> np.ndarray:
    """One-hot routing table M[p, m, n, s1, s2, dy, dx]: fine tap
    (dy, dx) of w3 contributes to phase p = 2*rho + sigma's coarse k2x2
    kernel at row m / col n, channel sub-block (s1, s2).

    Derivation (rows; cols identical): output fine row 2i + rho taps
    fine rows 2i + rho + dy - 1 = 2(i + m) + s1, so the coarse offset m
    and phase s1 solve 2m + s1 = rho + dy - 1; the kernel row index is
    m - min(m) = m + (1 - rho).
    """
    m_ = np.zeros((4, 2, 2, 2, 2, k, k), np.float32)
    for rho in range(2):
        for sig in range(2):
            for dy in range(k):
                a = rho + dy - 1
                mi, s1 = a // 2 + (1 - rho), a % 2
                for dx in range(k):
                    b = sig + dx - 1
                    ni, s2 = b // 2 + (1 - sig), b % 2
                    m_[2 * rho + sig, mi, ni, s1, s2, dy, dx] = 1.0
    return m_


_PHASE_MAP = _phase_map(3)


def _phase_kernels(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, c, f) -> (4, 2, 2, 4c, f) per-phase coarse kernels over
    the (c, s1, s2) coarse channel layout."""
    _, _, c, f = w3.shape
    wk = jnp.einsum(
        "pmnstyx,yxcf->pmncstf", jnp.asarray(_PHASE_MAP, w3.dtype), w3
    )
    return wk.reshape(4, 2, 2, 4 * c, f)


def _mirror_pad_coarse(x: jnp.ndarray) -> jnp.ndarray:
    """Pad one coarse row/col per side carrying the FINE-grid reflect
    semantics: the pad row at coarse -1 holds fine rows (-2, -1) ->
    reflect -> fine (2, 1) = (coarse 1, s1=0) and (coarse 0, s1=1)."""
    n, hc, wc, c4 = x.shape
    cf = c4 // 4
    xr = x.reshape(n, hc, wc, cf, 2, 2)
    top = jnp.stack(
        [xr[:, 1:2, :, :, 0, :], xr[:, 0:1, :, :, 1, :]], axis=4
    ).reshape(n, 1, wc, c4)
    bot = jnp.stack(
        [xr[:, hc - 1 : hc, :, :, 0, :], xr[:, hc - 2 : hc - 1, :, :, 1, :]],
        axis=4,
    ).reshape(n, 1, wc, c4)
    x = jnp.concatenate([top, x, bot], axis=1)
    xr = x.reshape(n, hc + 2, wc, cf, 2, 2)
    left = jnp.stack(
        [xr[:, :, 1:2, :, :, 0], xr[:, :, 0:1, :, :, 1]], axis=5
    ).reshape(n, hc + 2, 1, c4)
    right = jnp.stack(
        [xr[:, :, wc - 1 : wc, :, :, 0], xr[:, :, wc - 2 : wc - 1, :, :, 1]],
        axis=5,
    ).reshape(n, hc + 2, 1, c4)
    return jnp.concatenate([left, x, right], axis=2)


def up2_applicable(coarse_shape, cm_out: bool = False) -> bool:
    """cm_out identifies the U4 site feeding the channel-major tail
    chain; VCT_BLOCK_FORMS_UP accepts 0/1 plus 'cm' (only that site)
    and 'nocm' (every other site) for A/B isolation."""
    _, hc, wc, c4 = coarse_shape
    mode = os.environ.get(
        "VCT_BLOCK_FORMS_UP", os.environ.get("VCT_BLOCK_FORMS", "0"))
    on = {"0": False, "1": True,
          "cm": cm_out, "nocm": not cm_out}.get(mode, False)
    return on and hc >= 2 and wc >= 2 and c4 % 4 == 0


def up2_conv(
    x: jnp.ndarray, w3: jnp.ndarray, cm_out: bool = False
) -> jnp.ndarray:
    """== reflect_conv(pixel_shuffle(x, 2), w3); x coarse NHWC
    (n, hc, wc, 4c), w3 (3, 3, c, f).  cm_out emits channel-major
    (n, 2hc, f, 2wc) straight from the phase stack (same-cost transpose,
    feeds the Pallas tail site's native layout)."""
    n, hc, wc, _ = x.shape
    f = w3.shape[-1]
    wk = _phase_kernels(w3).astype(x.dtype)
    xp = _mirror_pad_coarse(x)
    outs = []
    for rho in range(2):
        for sig in range(2):
            xin = xp[:, rho : rho + hc + 1, sig : sig + wc + 1]
            outs.append(_conv(xin, wk[2 * rho + sig]))
    y4 = jnp.stack(outs, axis=3).reshape(n, hc, wc, 2, 2, f)
    if cm_out:
        y4 = y4.transpose(0, 1, 3, 5, 2, 4)  # (n, hc, rho, f, wc, sig)
        return y4.reshape(n, 2 * hc, f, 2 * wc)
    y4 = y4.transpose(0, 1, 3, 2, 4, 5)  # (n, hc, rho, wc, sig, f)
    return y4.reshape(n, 2 * hc, 2 * wc, f)
