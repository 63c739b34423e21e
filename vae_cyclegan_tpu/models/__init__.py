"""Flax module zoo + per-architecture training tasks."""

from vae_cyclegan_tpu.models.networks import (
    Encoder,
    Decoder,
    VariationalEncoderBlock,
    VariationalDecoderBlock,
    Discriminator,
    AutoencoderNet,
    VariationalAutoencoderNet,
)
