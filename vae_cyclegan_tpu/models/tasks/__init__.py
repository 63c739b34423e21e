"""Architecture registry — string name -> Task factory.

Mirrors the reference's `create_model` dispatch (train.py:43-77) with the
same 10 architecture names.
"""

from __future__ import annotations

from typing import Dict, Optional, Type

from vae_cyclegan_tpu.config import LossConfig, ModelConfig, OptimConfig
from vae_cyclegan_tpu.models.tasks.base import Task
from vae_cyclegan_tpu.models.tasks.cycle import CycleAETask, CycleVAETask
from vae_cyclegan_tpu.models.tasks.cyclegan import CycleAEGANTask, CycleVAEGANTask
from vae_cyclegan_tpu.models.tasks.gan import AEGANTask, VAEGANTask
from vae_cyclegan_tpu.models.tasks.simple import (
    AutoencoderTask,
    DoubleAETask,
    DoubleVAETask,
    VAETask,
)

ARCHITECTURES: Dict[str, Type[Task]] = {
    "autoencoder": AutoencoderTask,
    "doubleae": DoubleAETask,
    "doublevae": DoubleVAETask,
    "vae": VAETask,
    "aegan": AEGANTask,
    "vaegan": VAEGANTask,
    "cycleae": CycleAETask,
    "cyclevae": CycleVAETask,
    "cycleaegan": CycleAEGANTask,
    "cyclevaegan": CycleVAEGANTask,
}


def create_task(
    architecture: str,
    model: Optional[ModelConfig] = None,
    optim: Optional[OptimConfig] = None,
    loss: Optional[LossConfig] = None,
    paired: bool = True,
) -> Task:
    """String -> Task factory (reference train.py:43-77)."""
    if architecture not in ARCHITECTURES:
        raise ValueError(f"Unknown architecture: {architecture}")
    return ARCHITECTURES[architecture](
        model=model, optim=optim, loss=loss, paired=paired
    )
