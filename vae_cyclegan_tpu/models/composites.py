"""Composite parameter-sharing networks that need a single Flax param tree.

DoubleAutoencoder / DoubleVariationalAutoencoder share one encoder between
two decoders (reference: Networks.py:415-605, 608-852); they live here as
single modules so the shared encoder is one parameter subtree (enabling the
weight-transfer surgery into Cycle models, reference utils.py:57-239).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vae_cyclegan_tpu.models.networks import (
    Decoder,
    Encoder,
    VariationalDecoderBlock,
    VariationalEncoderBlock,
)

Dtype = Any


class DoubleAENet(nn.Module):
    """Shared Encoder + decoder_A + decoder_B (Networks.py:415-466).

    __call__(x, y) -> (Gx, Gy): reconstruction of each modality through its
    own decoder. translate_* methods produce the cross translations used for
    validation visualization (Networks.py:468-476).
    """

    base_width: int = 64
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = Encoder(self.base_width, self.use_pallas, self.dtype)
        self.decoder_A = Decoder(self.base_width, 3, self.use_pallas, self.dtype)
        self.decoder_B = Decoder(self.base_width, 3, self.use_pallas, self.dtype)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        Gx = self.decoder_A(self.encoder(x))
        Gy = self.decoder_B(self.encoder(y))
        return Gx, Gy

    def translate_A_to_B(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decoder_B(self.encoder(x))

    def translate_B_to_A(self, y: jnp.ndarray) -> jnp.ndarray:
        return self.decoder_A(self.encoder(y))


class DoubleVAENet(nn.Module):
    """Shared Encoder + per-modality VAE blocks + per-modality decoders
    (Networks.py:608-707).

    __call__(x, y) -> (Gx, Gy, mu_x, logvar_x, mu_y, logvar_y).
    """

    latent_dim: int = 64
    base_width: int = 64
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = Encoder(self.base_width, self.use_pallas, self.dtype)
        self.vae_encoder_block_A = VariationalEncoderBlock(self.latent_dim, self.dtype)
        self.vae_encoder_block_B = VariationalEncoderBlock(self.latent_dim, self.dtype)
        self.vae_decoder_block_A = VariationalDecoderBlock(
            self.base_width * 16, self.dtype
        )
        self.vae_decoder_block_B = VariationalDecoderBlock(
            self.base_width * 16, self.dtype
        )
        self.decoder_A = Decoder(self.base_width, 3, self.use_pallas, self.dtype)
        self.decoder_B = Decoder(self.base_width, 3, self.use_pallas, self.dtype)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        z_x, mu_x, logvar_x = self.vae_encoder_block_A(self.encoder(x))
        z_y, mu_y, logvar_y = self.vae_encoder_block_B(self.encoder(y))
        Gx = self.decoder_A(self.vae_decoder_block_A(z_x))
        Gy = self.decoder_B(self.vae_decoder_block_B(z_y))
        return Gx, Gy, mu_x, logvar_x, mu_y, logvar_y

    def translate_A_to_B(self, x: jnp.ndarray) -> jnp.ndarray:
        z, _, _ = self.vae_encoder_block_B(self.encoder(x))
        return self.decoder_B(self.vae_decoder_block_B(z))

    def translate_B_to_A(self, y: jnp.ndarray) -> jnp.ndarray:
        z, _, _ = self.vae_encoder_block_A(self.encoder(y))
        return self.decoder_A(self.vae_decoder_block_A(z))
