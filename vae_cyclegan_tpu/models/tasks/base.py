"""Task base: one object per architecture bundling module construction,
state init, and pure jittable train/eval steps.

The reference's organizing idea is a model-owned training protocol — every
composite implements forward / configure_optimizers / configure_loss /
training_step / validation_step (Networks.py:9-44) so one generic driver
trains all architectures. The TPU-native translation: each Task builds its
Flax modules and optax optimizers once, and exposes

    init_state(rng)            -> TrainState
    train_step(state, batch)   -> (TrainState, metrics)   [pure, jit/pjit]
    eval_step(state, batch, rng) -> metrics (incl. 'Gx' / 'Fy' images)

Metric dict keys replicate the reference's per-architecture metric dicts
exactly (the driver diff-checks TB tag schemas).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vae_cyclegan_tpu.config import LossConfig, ModelConfig, OptimConfig
from vae_cyclegan_tpu.models.state import TrainState


class Task:
    """Base class; subclasses set `name` and implement the protocol."""

    name: str = "base"
    #: whether eval_step emits a second image stream 'Fy' (Cycle/Double archs)
    has_fy: bool = False

    def __init__(
        self,
        model: Optional[ModelConfig] = None,
        optim: Optional[OptimConfig] = None,
        loss: Optional[LossConfig] = None,
        paired: bool = True,
    ):
        self.mc = model or ModelConfig()
        self.oc = optim or OptimConfig()
        self.lc = loss or LossConfig()
        self.paired = paired

    # -- helpers ----------------------------------------------------------

    def _adam(self) -> optax.GradientTransformation:
        """Adam matching torch defaults (betas 0.5/0.999, eps 1e-8;
        reference Networks.py:18, train.py:627)."""
        return optax.adam(
            learning_rate=self.oc.lr,
            b1=self.oc.betas[0],
            b2=self.oc.betas[1],
            eps=self.oc.eps,
        )

    @staticmethod
    def _finite_update(
        tx: optax.GradientTransformation,
        loss: jnp.ndarray,
        grads: Any,
        params: Any,
        opt_state: Any,
        batch: Any = None,
    ) -> Tuple[Any, Any, jnp.ndarray]:
        """Apply the optimizer update only when the loss is finite.

        Mirrors the reference's NaN/Inf guard that skips the optimizer step
        and flags the batch (Networks.py:356-372), generalized to every
        architecture as a jit-safe lax.cond. When nan-dump is enabled
        (utils.nan_dump.enable, wired by the driver), the skip branch also
        writes the offending loss/batch/params/grads to the run dir — the
        TPU equivalent of the reference's console dump of every parameter
        and gradient.
        Returns (params, opt_state, nan_detected_flag).

        Data parallelism: under the engine's shard_map step (parallel.dp),
        this is THE cross-device sync point — (loss, grads) are pmean'd
        over the 'data' axis here, so the optimizer update below is
        identical on every shard (params stay replicated) and the finite
        gate takes the same branch everywhere (NaNs survive pmean).
        """
        from vae_cyclegan_tpu.parallel import dp
        from vae_cyclegan_tpu.utils import nan_dump

        loss, grads = dp.sync((loss, grads))
        finite = jnp.isfinite(loss)

        # lax.cond (not a branch-free masked select): the cond lets XLA
        # alias the skip branch to the donated input buffers, while a
        # tree-wide jnp.where(finite, new, old) materializes both trees —
        # measured 62-64 img/s (select) vs ~65.6 (cond) on the flagship.
        def _apply(_):
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        def _skip(_):
            if nan_dump.enabled():  # trace-time gate: zero cost when off
                jax.debug.callback(
                    nan_dump.write_dump, loss, batch, params, grads
                )
            return params, opt_state

        new_params, new_opt_state = jax.lax.cond(finite, _apply, _skip, None)
        return new_params, new_opt_state, (1.0 - finite.astype(jnp.float32))

    def _maybe_remat(self, fn: Callable) -> Callable:
        """Rematerialize generator forwards when configured — CycleVAEGAN
        runs 6 generator + 8 discriminator forwards per step at 256^2
        (SURVEY.md §3.4); remat trades recompute FLOPs for HBM."""
        return jax.checkpoint(fn) if self.mc.remat else fn

    # -- protocol ----------------------------------------------------------

    def init_state(self, rng: jax.Array) -> TrainState:
        raise NotImplementedError

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        raise NotImplementedError

    def eval_step(
        self, state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def generate(
        self, state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> jnp.ndarray:
        """Forward producing Gx only (the reference's `model(...)[ 0 ]` used
        by test.py:309-312 and the train-loop viz, train.py:112-117)."""
        raise NotImplementedError

    def _dummy_batch(self, batch_size: int = 1) -> Dict[str, jnp.ndarray]:
        s = self.mc.image_size
        x = jnp.zeros((batch_size, s, s, 3), jnp.float32)
        return {"x": x, "y": x}
