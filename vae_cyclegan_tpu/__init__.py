"""vae_cyclegan_tpu: TPU-native (JAX/Flax/XLA/Pallas) rebuild of the
Baverne/VAE-CYCLEGAN-Implementation capability set.

The reference is a single-device PyTorch research repo implementing a family
of 10 image-to-image translation architectures (AE .. CycleVAEGAN) over a
shared conv encoder/decoder backbone (reference: Networks.py). This package
re-designs the same capabilities TPU-first:

- NHWC Flax modules lowered to XLA convolutions (MXU-friendly)
- fused InstanceNorm+activation Pallas kernels for the memory-bound per-layer
  pattern (reference hot path, Networks.py:57-149)
- one fused, jitted alternating G/D train step per architecture
  (reference: per-model `training_step`, Networks.py:30-44)
- data parallelism over a `jax.sharding.Mesh` with gradient all-reduce
  emitted by the SPMD partitioner (no analog in the reference)
"""

__version__ = "0.1.0"

from vae_cyclegan_tpu.config import ModelConfig, OptimConfig, LossConfig
