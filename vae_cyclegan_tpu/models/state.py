"""Functional training state.

The reference stores optimizers and loss functions as mutable attributes on
each nn.Module (Networks.py:18-29). Under jit, state must be an explicit
pytree threaded through a pure step function; one TrainState shape covers all
10 architectures by keying params / optimizer states / spectral-norm stats by
component group name (e.g. {'G', 'D'} or {'GF', 'D'}).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    """Pytree of everything a train step reads and writes.

    Attributes:
      step: global step counter (int32 scalar).
      params: dict[group -> flax 'params' collection].
      spectral: dict[disc name -> 'spectral' collection] (power-iteration
        u/v vectors); empty dict for non-GAN architectures.
      opt_state: dict[optimizer name -> optax state]; groups mirror the
        reference's optimizer layout (one 'model' Adam, or 'G'+'D' Adams).
      rng: PRNG key consumed and re-split every step (reparameterization
        noise, replacing torch's global RNG).
    """

    step: jax.Array
    params: Dict[str, Any]
    spectral: Dict[str, Any]
    opt_state: Dict[str, Any]
    rng: jax.Array
