"""Checkpointing, TensorBoard logging, weight transfer, profiling helpers."""

from vae_cyclegan_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    checkpoint_exists,
)
from vae_cyclegan_tpu.utils.transfer import (
    load_pretrained_doubleae_to_cycle,
    load_pretrained_doublevae_to_cycle,
)
from vae_cyclegan_tpu.utils.preempt import GracefulShutdown
