"""Augmentations with explicitly sampled parameters.

The reference synchronizes random transforms across modalities by saving and
restoring torch's global RNG state around each `transform(img)` call
(reference: Data_Manager.py:170-188, 377-381). The TPU-native replacement
samples transform *parameters* once per example from an explicit
`random.Random`, then applies the same parameters to every modality — no
global-state tricks, reproducible under any parallelism.

Transform semantics mirror the torchvision pipeline used by train.py:
  RandomHorizontalFlip(p) / RandomVerticalFlip(p)
  RandomResizedCrop(size, scale=(0.33,1.0), ratio=(1,1), bicubic)
    (train.py:184-191)
  ColorJitter(brightness, contrast, saturation, hue) applied before the
    spatial transform for the color modality (train.py:194-196,
    Data_Manager.py:176-182)
Images stay in [0,1]; Normalize is commented out in the reference
(train.py:190).
"""

from __future__ import annotations

import dataclasses
import math
import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image


@dataclasses.dataclass(frozen=True)
class ColorJitterConfig:
    brightness: float = 0.3
    contrast: float = 0.3
    saturation: float = 0.3
    hue: float = 0.15


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    out_size: int = 256
    hflip_p: float = 0.5
    vflip_p: float = 0.0
    crop_scale: Tuple[float, float] = (0.33, 1.0)
    random_crop: bool = True  # False => deterministic Resize (test transform)


@dataclasses.dataclass(frozen=True)
class SpatialParams:
    hflip: bool
    vflip: bool
    # crop as fractions of the source image (resolution-independent so the
    # same params apply to x and y even if sizes differ slightly)
    area_frac: float
    top_frac: float
    left_frac: float


@dataclasses.dataclass(frozen=True)
class ColorParams:
    order: Tuple[int, int, int, int]
    brightness: float
    contrast: float
    saturation: float
    hue: float


def sample_spatial_params(rng: random.Random, cfg: AugmentConfig) -> SpatialParams:
    return SpatialParams(
        hflip=rng.random() < cfg.hflip_p,
        vflip=rng.random() < cfg.vflip_p,
        area_frac=rng.uniform(*cfg.crop_scale),
        top_frac=rng.random(),
        left_frac=rng.random(),
    )


def sample_color_params(
    rng: random.Random, cfg: ColorJitterConfig
) -> ColorParams:
    order = list(range(4))
    rng.shuffle(order)
    return ColorParams(
        order=tuple(order),
        brightness=rng.uniform(max(0.0, 1 - cfg.brightness), 1 + cfg.brightness),
        contrast=rng.uniform(max(0.0, 1 - cfg.contrast), 1 + cfg.contrast),
        saturation=rng.uniform(max(0.0, 1 - cfg.saturation), 1 + cfg.saturation),
        hue=rng.uniform(-cfg.hue, cfg.hue),
    )


def apply_spatial(
    img: Image.Image, cfg: AugmentConfig, params: Optional[SpatialParams]
) -> np.ndarray:
    """Flip + square RandomResizedCrop(ratio=1) + bicubic resize -> f32 [0,1].

    With ratio fixed at (1,1) the torchvision sampler reduces to: side =
    floor(sqrt(area_frac * W * H)) clamped to the image, uniform top-left.
    """
    s = cfg.out_size
    if params is None or not cfg.random_crop:
        out = img.resize((s, s), Image.BICUBIC)
        if params is not None:
            if params.hflip:
                out = out.transpose(Image.FLIP_LEFT_RIGHT)
            if params.vflip:
                out = out.transpose(Image.FLIP_TOP_BOTTOM)
        return _to_float(out)

    if params.hflip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if params.vflip:
        img = img.transpose(Image.FLIP_TOP_BOTTOM)
    w, h = img.size
    side = int(round(math.sqrt(params.area_frac * w * h)))
    side = max(1, min(side, w, h))
    top = int(params.top_frac * (h - side + 1))
    left = int(params.left_frac * (w - side + 1))
    img = img.crop((left, top, left + side, top + side))
    img = img.resize((s, s), Image.BICUBIC)
    return _to_float(img)


def _to_float(img: Image.Image) -> np.ndarray:
    return np.asarray(img, dtype=np.float32) / 255.0


def apply_color_jitter(img: Image.Image, params: ColorParams) -> Image.Image:
    """ColorJitter with torchvision's adjustment formulas on [0,1] floats."""
    arr = _to_float(img)
    for op in params.order:
        if op == 0:
            arr = np.clip(arr * params.brightness, 0.0, 1.0)
        elif op == 1:
            gray = _grayscale(arr)
            mean = gray.mean()
            arr = np.clip(arr * params.contrast + (1 - params.contrast) * mean, 0, 1)
        elif op == 2:
            gray = _grayscale(arr)[..., None]
            arr = np.clip(
                arr * params.saturation + (1 - params.saturation) * gray, 0, 1
            )
        elif op == 3 and params.hue != 0.0:
            arr = _shift_hue(arr, params.hue)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))


def _grayscale(arr: np.ndarray) -> np.ndarray:
    return arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114


def _shift_hue(arr: np.ndarray, hue_shift: float) -> np.ndarray:
    """Shift hue by `hue_shift` (fraction of a full turn), vectorized HSV."""
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    maxc = arr.max(-1)
    minc = arr.min(-1)
    v = maxc
    delta = maxc - minc
    safe = np.where(delta == 0, 1.0, delta)
    sat = np.where(maxc == 0, 0.0, delta / np.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = np.where(
        maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    h = (h + hue_shift) % 1.0

    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - sat)
    q = v * (1.0 - sat * f)
    t = v * (1.0 - sat * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.empty_like(arr)
    conds = [i == k for k in range(6)]
    out[..., 0] = np.select(conds, [v, q, p, p, t, v])
    out[..., 1] = np.select(conds, [t, v, v, q, p, p])
    out[..., 2] = np.select(conds, [p, p, t, v, v, q])
    return out
