"""Loss formula parity tests against hand-computed values and torch oracles
mirroring Losses.py:14-121 of the reference."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_cyclegan_tpu import losses


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def test_translation_loss(rng):
    a = rng.randn(2, 4, 4, 3).astype(np.float32)
    b = rng.randn(2, 4, 4, 3).astype(np.float32)
    got = float(losses.translation_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch.nn.L1Loss()(torch.from_numpy(a), torch.from_numpy(b)))
    assert got == pytest.approx(want, rel=1e-6)


def test_cycle_consistency_loss(rng):
    x, y, FGx, GFy = (rng.randn(2, 4, 4, 3).astype(np.float32) for _ in range(4))
    got = float(
        losses.cycle_consistency_loss(*(jnp.asarray(v) for v in (x, y, FGx, GFy)))
    )
    l1 = torch.nn.L1Loss()
    want = float(
        l1(torch.from_numpy(FGx), torch.from_numpy(x))
        + l1(torch.from_numpy(GFy), torch.from_numpy(y))
    )
    assert got == pytest.approx(want, rel=1e-6)


def test_identity_loss(rng):
    x, y, Fx, Gy = (rng.randn(2, 4, 4, 3).astype(np.float32) for _ in range(4))
    got = float(losses.identity_loss(*(jnp.asarray(v) for v in (x, y, Fx, Gy))))
    l1 = torch.nn.L1Loss()
    want = float(
        l1(torch.from_numpy(Fx), torch.from_numpy(x))
        + l1(torch.from_numpy(Gy), torch.from_numpy(y))
    )
    assert got == pytest.approx(want, rel=1e-6)


def test_gan_loss_generator_includes_constant_real_term(rng):
    """The generator loss includes MSE(D_real, 0), a term the generator can't
    influence — quirk preserved from Losses.py:78-83."""
    d_real = rng.randn(8).astype(np.float32)
    d_fake = rng.randn(8).astype(np.float32)
    total, real, fake = losses.gan_loss_generator(
        jnp.asarray(d_real), jnp.asarray(d_fake)
    )
    want_real = float(np.mean(d_real**2))
    want_fake = float(np.mean((d_fake - 1.0) ** 2))
    assert float(real) == pytest.approx(want_real, rel=1e-6)
    assert float(fake) == pytest.approx(want_fake, rel=1e-6)
    assert float(total) == pytest.approx(want_real + want_fake, rel=1e-6)


def test_gan_loss_discriminator(rng):
    d_real = rng.randn(8).astype(np.float32)
    d_fake = rng.randn(8).astype(np.float32)
    total, real, fake = losses.gan_loss_discriminator(
        jnp.asarray(d_real), jnp.asarray(d_fake)
    )
    assert float(real) == pytest.approx(float(np.mean((d_real - 1) ** 2)), rel=1e-6)
    assert float(fake) == pytest.approx(float(np.mean(d_fake**2)), rel=1e-6)
    assert float(total) == pytest.approx(float(real) + float(fake), rel=1e-6)


def test_kl_divergence_mean_normalization_and_clamp(rng):
    """KL is the mean over ALL elements (not a per-sample sum), with logvar
    clamped to [-10, 10] — Losses.py:115-121."""
    mu = rng.randn(2, 4, 4, 8).astype(np.float32)
    logvar = (rng.randn(2, 4, 4, 8) * 8).astype(np.float32)  # exercises clamp
    got = float(losses.kl_divergence(jnp.asarray(mu), jnp.asarray(logvar)))
    lv = np.clip(logvar, -10, 10)
    want = float(-0.5 * np.mean(1 + lv - mu**2 - np.exp(lv)))
    assert got == pytest.approx(want, rel=1e-5)


def test_kl_zero_at_standard_normal():
    mu = jnp.zeros((2, 3, 3, 4))
    logvar = jnp.zeros((2, 3, 3, 4))
    assert float(losses.kl_divergence(mu, logvar)) == pytest.approx(0.0, abs=1e-7)
