"""Atomic loss functions, formula-exact with the reference (Losses.py:14-121).

All reductions are full-tensor means computed in float32; the composite
per-architecture wiring (which terms enter G_loss, which enter D_loss) lives
in the per-architecture tasks, mirroring the reference's model-owned
``configure_loss``/``training_step`` design.

Quirks intentionally preserved (SURVEY.md §2.5):
  * ``gan_loss_generator`` includes the constant MSE(D_real, 0) term the
    generator cannot influence (Losses.py:80); CycleVAEGAN alone drops it
    from G_loss (Networks.py:2013) — handled by that task, not here.
  * ``kl_divergence`` normalizes by the mean over every element, not a
    per-sample sum (Losses.py:119); lambda_kl=1e-5 is calibrated to that.
  * logvar is clamped to [-10, 10] inside the KL (Losses.py:117), in
    addition to the clamp inside the variational encoder block.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(a) - _f32(b)))


def mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(_f32(a) - _f32(b)))


def translation_loss(generated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L_trans = ||generated - target||_1 (mean). Ref: Losses.py:14-24."""
    return l1_loss(generated, target)


def cycle_consistency_loss(
    x: jnp.ndarray, y: jnp.ndarray, FGx: jnp.ndarray, GFy: jnp.ndarray
) -> jnp.ndarray:
    """L_cycle = ||F(G(x)) - x||_1 + ||G(F(y)) - y||_1. Ref: Losses.py:27-39."""
    return l1_loss(FGx, x) + l1_loss(GFy, y)


def identity_loss(
    x: jnp.ndarray, y: jnp.ndarray, Fx: jnp.ndarray, Gy: jnp.ndarray
) -> jnp.ndarray:
    """L_id = ||F(x) - x||_1 + ||G(y) - y||_1. Ref: Losses.py:42-65."""
    return l1_loss(Fx, x) + l1_loss(Gy, y)


def gan_loss_generator(
    d_real: jnp.ndarray, d_fake: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LSGAN generator loss: MSE(D_real, 0) + MSE(D_fake, 1).

    Returns (total, real_term, fake_term). The real term is a constant w.r.t.
    the generator but is included in most architectures' G_loss exactly as in
    the reference (Losses.py:67-83).
    """
    real = mse_loss(d_real, jnp.zeros_like(d_real))
    fake = mse_loss(d_fake, jnp.ones_like(d_fake))
    return real + fake, real, fake


def gan_loss_discriminator(
    d_real: jnp.ndarray, d_fake: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LSGAN discriminator loss: MSE(D_real, 1) + MSE(D_fake, 0).

    Returns (total, real_term, fake_term). Ref: Losses.py:86-102.
    """
    real = mse_loss(d_real, jnp.ones_like(d_real))
    fake = mse_loss(d_fake, jnp.zeros_like(d_fake))
    return real + fake, real, fake


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) = -0.5 * mean(1 + logvar - mu^2 - exp(logvar)).

    Mean over all elements (not per-sample sum); logvar clamped to [-10, 10].
    Ref: Losses.py:105-121.
    """
    lv = jnp.clip(_f32(logvar), -10.0, 10.0)
    m = _f32(mu)
    return -0.5 * jnp.mean(1.0 + lv - jnp.square(m) - jnp.exp(lv))
