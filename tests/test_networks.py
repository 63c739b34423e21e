"""Shape golden tests for molecular networks, porting the reference smoke
expectations (Networks.py:2153-2244) at a reduced image size.

At image_size=64, base_width=16 the encoder maps 64^2 x 3 -> 4^2 x 256 (the
reference maps 256^2 x 3 -> 16^2 x 1024 with base_width 64); ratios match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_cyclegan_tpu.models import (
    AutoencoderNet,
    Decoder,
    Discriminator,
    Encoder,
    VariationalAutoencoderNet,
    VariationalDecoderBlock,
    VariationalEncoderBlock,
)

B, S, W = 2, 64, 16


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def x(key):
    return jax.random.uniform(key, (B, S, S, 3))


def test_encoder_shape(key, x):
    enc = Encoder(base_width=W)
    z = enc.apply(enc.init(key, x), x)
    assert z.shape == (B, S // 16, S // 16, W * 16)


def test_decoder_shape_and_unbounded(key):
    z = jax.random.normal(key, (B, S // 16, S // 16, W * 16))
    dec = Decoder(base_width=W)
    out = dec.apply(dec.init(key, z), z)
    assert out.shape == (B, S, S, 3)
    # final CaSb has Identity activation and no norm: output unbounded
    assert float(jnp.min(out)) < 0 or float(jnp.max(out)) > 1


def test_variational_blocks(key):
    z = jax.random.normal(key, (B, 4, 4, W * 16))
    veb = VariationalEncoderBlock(latent_dim=8)
    variables = veb.init({"params": key, "reparam": key}, z)
    zz, mu, logvar = veb.apply(variables, z, rngs={"reparam": key})
    assert zz.shape == mu.shape == logvar.shape == (B, 4, 4, 8)
    assert float(jnp.max(logvar)) <= 10.0 and float(jnp.min(logvar)) >= -10.0

    vdb = VariationalDecoderBlock(out_channels=W * 16)
    out = vdb.apply(vdb.init(key, zz), zz)
    assert out.shape == (B, 4, 4, W * 16)


def test_reparameterization_uses_rng(key):
    z = jax.random.normal(key, (B, 4, 4, W * 16))
    veb = VariationalEncoderBlock(latent_dim=8)
    variables = veb.init({"params": key, "reparam": key}, z)
    z1, mu, _ = veb.apply(variables, z, rngs={"reparam": jax.random.PRNGKey(1)})
    z2, _, _ = veb.apply(variables, z, rngs={"reparam": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(mu))


def test_discriminator_scalar_per_image(key, x):
    disc = Discriminator(final_kernel=S // 16, base_width=W)
    variables = disc.init(key, x)
    d = disc.apply(variables, x)
    assert d.shape == (B,)
    assert set(variables.keys()) == {"params", "spectral"}


def test_discriminator_spectral_updates_only_in_training(key, x):
    disc = Discriminator(final_kernel=S // 16, base_width=W)
    variables = disc.init(key, x)
    # cout=1 so u is a fixed +-1 scalar; the evolving state is v (size N)
    v0 = np.asarray(variables["spectral"]["SpectralConv_0"]["v"])
    # eval: no mutation needed, v unchanged
    _ = disc.apply(variables, x, update_stats=False)
    # train: one power iteration per call
    _, mut = disc.apply(variables, x, update_stats=True, mutable=["spectral"])
    v1 = np.asarray(mut["spectral"]["SpectralConv_0"]["v"])
    assert not np.allclose(v0, v1)


def test_autoencoder_roundtrip_shape(key, x):
    net = AutoencoderNet(base_width=W)
    out = net.apply(net.init(key, x), x)
    assert out.shape == x.shape


def test_vae_outputs(key, x):
    net = VariationalAutoencoderNet(latent_dim=8, base_width=W)
    variables = net.init({"params": key, "reparam": key}, x)
    Gx, mu, logvar = net.apply(variables, x, rngs={"reparam": key})
    assert Gx.shape == x.shape
    assert mu.shape == (B, S // 16, S // 16, 8)


def test_kaiming_init_statistics(key):
    """Conv kernels ~ N(0, 2/fan_out) per the reference init
    (Networks.py:168-178)."""
    enc = Encoder(base_width=W)
    params = enc.init(key, jnp.zeros((1, S, S, 3)))["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    checked = 0
    for path, leaf in flat:
        names = [getattr(p, "key", "") for p in path]
        if leaf.ndim == 4:  # conv kernel (kh, kw, cin, cout)
            kh, kw, _, cout = leaf.shape
            expected_std = np.sqrt(2.0 / (cout * kh * kw))
            got_std = float(jnp.std(leaf))
            assert abs(got_std - expected_std) / expected_std < 0.25, names
            checked += 1
        elif leaf.ndim == 1:  # bias
            assert float(jnp.max(jnp.abs(leaf))) == 0.0
    assert checked >= 6
