"""Configuration dataclasses for models, optimizers and losses.

The reference wires hyperparameters through argparse + per-model
``configure_optimizers`` / ``configure_loss`` methods (reference:
train.py:588-658, Networks.py:18-29). Here they are plain frozen dataclasses
passed to pure functions, so a jitted train step closes over static config
and retraces only when config changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture configuration.

    Attributes:
      image_size: spatial side of the (square) input images. The reference
        trains at 256 (train.py:614) and its Discriminator hardcodes a final
        16x16 kernel that only works at 256 (Networks.py:248); here the final
        kernel is derived as ``image_size // 16`` so small test images work.
      latent_dim: channels of the spatial VAE latent (Networks.py:856,
        default 64; the latent is (B, 16, 16, latent_dim) in NHWC).
      base_width: channels of the first encoder conv (64 in the reference).
      dtype: compute dtype for conv stacks. Normalization statistics and all
        loss reductions are always computed in float32.
      use_pallas: fused Pallas InstanceNorm+activation kernels. None (the
        default) = auto: engage on the TPU backend when the slab fits VMEM,
        pure-XLA lowering elsewhere. True forces the Pallas path (TPU only),
        False disables it.
      remat: rematerialize encoder/decoder activations (jax.checkpoint) to
        trade FLOPs for HBM — needed for the 6-generator-forward CycleVAEGAN
        step at 256^2 and large batch.
    """

    image_size: int = 256
    latent_dim: int = 64
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @property
    def disc_final_kernel(self) -> int:
        # 4 stride-2 convs reduce image_size by 16x; the reference closes the
        # remaining map with one kernel covering it entirely (Networks.py:248).
        k = self.image_size // 16
        if k < 1:
            raise ValueError(f"image_size {self.image_size} too small (min 16)")
        return k


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Adam settings; reference defaults at Networks.py:18 / train.py:627."""

    lr: float = 2e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    eps: float = 1e-8


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights; reference defaults at train.py:631-640."""

    lambda_kl: float = 1e-5
    lambda_gan: float = 1.0
    lambda_identity: float = 5.0
    lambda_cycle: float = 10.0
    lambda_recon: float = 1.0
