"""On-device augmentation: the host decodes, the TPU crops/flips/resizes.

The reference pipeline does decode + RandomResizedCrop + flips (+ jitter) on
host CPU workers (reference train.py:184-196, Data_Manager.py:170-188).
Measured on this host (ROADMAP.md): decode 0.8 ms + crop/resize 2.1 ms per
512^2 image ~= 50 pairs/s/core — nowhere near the ~430 img/s an 8-chip mesh
needs. The TPU-native split: the host only decodes (or mmaps a decoded
cache) and samples the augmentation PARAMETERS; full frames ship as uint8
and the jitted train step applies the synchronized spatial transform with
``jax.image.scale_and_translate`` (bicubic, anti-aliased) — resize work
moves to the accelerator where it is ~free next to the conv stack.

Wire format per example (uniform raw size (H0, W0) per dataset):
    x_raw: (H0, W0, 3) uint8          y_raw: (H0, W0, 3) uint8
    x_aug: (6,) float32               y_aug: (6,) float32
        [hflip, vflip, top, left, side_h, side_w]  (crop box in raw pixels;
        side_h != side_w only on the deterministic eval path, which
        resizes the full — possibly non-square — frame like the host)

`sample_crop_params` reproduces the host sampler's geometry exactly
(square RandomResizedCrop, scale=(0.33, 1), flips) so the two paths are
statistically identical; pixel values differ only by the interpolator
(PIL bicubic vs jax cubic).
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_cyclegan_tpu.data.transforms import (
    AugmentConfig,
    SpatialParams,
    sample_spatial_params,
)


def crop_box(
    params: SpatialParams, w: int, h: int, cfg: AugmentConfig
) -> Tuple[int, int, int]:
    """(top, left, side) of the square crop — the same arithmetic as the
    host path (transforms.apply_spatial_pil)."""
    if not cfg.random_crop:
        return 0, 0, min(w, h)  # deterministic eval path: full-frame resize
    side = int(round(math.sqrt(params.area_frac * w * h)))
    side = max(1, min(side, w, h))
    top = int(params.top_frac * (h - side + 1))
    left = int(params.left_frac * (w - side + 1))
    return top, left, side


def sample_aug_vector(
    rng: random.Random, cfg: AugmentConfig, w: int, h: int
) -> np.ndarray:
    """One (6,) float32 aug vector: [hflip, vflip, top, left,
    side_h, side_w]."""
    p = sample_spatial_params(rng, cfg)
    if not cfg.random_crop:
        # deterministic path: resize the FULL frame (aspect-squashing, like
        # the host's plain Resize), flips still honored
        return np.array(
            [float(p.hflip), float(p.vflip), 0.0, 0.0, float(h), float(w)],
            np.float32,
        )
    top, left, side = crop_box(p, w, h, cfg)
    return np.array(
        [float(p.hflip), float(p.vflip), float(top), float(left),
         float(side), float(side)],
        np.float32,
    )


def _augment_one(raw: jnp.ndarray, aug: jnp.ndarray, out_size: int):
    """uint8 (H0, W0, 3) + (5,) params -> float32 (S, S, 3) in [0, 1]."""
    h0, w0, _ = raw.shape
    x = raw.astype(jnp.float32) / 255.0
    # flips first, exactly like the host path (flip, then crop coords)
    x = jnp.where(aug[0] > 0.5, x[:, ::-1, :], x)
    x = jnp.where(aug[1] > 0.5, x[::-1, :, :], x)
    top, left, side_h, side_w = aug[2], aug[3], aug[4], aug[5]
    # crop [top, top+side_h) x [left, left+side_w) -> (S, S): output pixel
    # center (o + 0.5) maps to input (top + (o + 0.5) * side / S); with
    # scale_and_translate's convention x_out = x_in * scale + translation
    # that is scale = S / side, translation = -top * scale.
    scale_h = out_size / side_h
    scale_w = out_size / side_w
    translation = jnp.stack([-top * scale_h, -left * scale_w])
    y = jax.image.scale_and_translate(
        x,
        (out_size, out_size, 3),
        (0, 1),
        jnp.stack([scale_h, scale_w]),
        translation,
        method="cubic",
        antialias=True,
    )
    return jnp.clip(y, 0.0, 1.0)


def device_augment(
    raw: jnp.ndarray, aug: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Batched on-device augmentation (vmapped over the batch)."""
    return jax.vmap(lambda r, a: _augment_one(r, a, out_size))(raw, aug)


def augment_batch(batch: dict, out_size: int) -> dict:
    """Map a raw wire-format batch to the standard {'x','y'} batch; batches
    without raw keys pass through unchanged. Call inside the jitted step."""
    if "x_raw" not in batch:
        return batch
    out = {
        "x": device_augment(batch["x_raw"], batch["x_aug"], out_size),
        "y": device_augment(batch["y_raw"], batch["y_aug"], out_size),
    }
    out.update(
        {k: v for k, v in batch.items()
         if k not in ("x_raw", "y_raw", "x_aug", "y_aug")}
    )
    return out
