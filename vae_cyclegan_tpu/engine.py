"""Generic epoch engine: one driver loop trains all 10 architectures.

Replaces the reference's train_epoch/validate (train.py:80-171). Differences
by design, for TPU throughput:
  * metrics stay on device as scalar arrays; the epoch average is computed
    with one tree-reduce and fetched once per epoch (the reference calls
    `.item()` per metric per step — a sync point per step,
    Networks.py:2054-2073)
  * the visualization forward runs once on the last batch per epoch instead
    of once per step (the reference recomputes it every step and discards
    all but the last, train.py:109-117)
  * batches are placed onto the mesh ('data'-sharded) before the step; the
    SPMD partitioner emits the gradient all-reduce inside the jitted step.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from vae_cyclegan_tpu.models.state import TrainState
from vae_cyclegan_tpu.models.tasks.base import Task
from vae_cyclegan_tpu.parallel import make_mesh, replicate_state, shard_batch

try:
    from tqdm import tqdm
except Exception:  # pragma: no cover
    def tqdm(it, **kw):
        return it


def _normalize_batch(batch):
    import jax.numpy as jnp

    return {
        k: (v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v)
        for k, v in batch.items()
    }


def _to_float_image(arr):
    arr = np.asarray(arr)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    return arr


class Engine:
    """Owns the jitted step functions, mesh placement, and epoch loops."""

    def __init__(self, task: Task, mesh=None, donate: bool = True):
        from vae_cyclegan_tpu.data.device_aug import augment_batch

        self.task = task
        self.mesh = mesh if mesh is not None else make_mesh()
        # Batches may arrive as uint8 (4x cheaper host->device transfer) or
        # as raw full frames + aug vectors (on-device augmentation,
        # data.device_aug); both resolve to normalized f32 {'x','y'} here,
        # inside the jitted step.
        out_size = task.mc.image_size

        def _prep(b):
            return _normalize_batch(augment_batch(b, out_size))

        self.train_step = jax.jit(
            lambda s, b: task.train_step(s, _prep(b)),
            donate_argnums=(0,) if donate else (),
        )
        self.eval_step = jax.jit(
            lambda s, b, r: task.eval_step(s, _prep(b), r)
        )
        self.generate = jax.jit(
            lambda s, b, r: task.generate(s, _prep(b), r)
        )

    def init_state(self, seed: int = 0) -> TrainState:
        state = self.task.init_state(jax.random.PRNGKey(seed))
        return replicate_state(state, self.mesh)

    def place(self, state: TrainState) -> TrainState:
        return replicate_state(state, self.mesh)

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return shard_batch(batch, self.mesh)

    def train_epoch(
        self,
        state: TrainState,
        loader,
        progress: bool = True,
        epoch: Optional[int] = None,
        should_stop=None,
    ) -> Tuple[TrainState, float, Dict[str, float], Any]:
        """Returns (state, avg_G_loss, avg_metric_components, last_batch).

        `should_stop`: optional zero-arg callable polled once per step
        (after the step's dispatch); returning True ends the epoch early
        with the partial averages. Used for preemption-graceful shutdown
        (utils.preempt) — the caller checks its flag and saves a
        resumable checkpoint.
        """
        metric_sums: Dict[str, Any] = {}
        n_batches = 0
        last_batch = None
        it = tqdm(loader, desc="Training") if progress else loader
        t0 = time.perf_counter()
        n_images = 0
        # Lagged per-step loss display (reference train.py:107 shows
        # pbar.set_postfix per step). A direct fetch would be a device sync
        # per step; instead keep recent G_loss arrays and show the newest
        # one that has already materialized (is_ready() never blocks),
        # throttled to ~2 fetches/sec so tunneled backends (~28 ms RPC per
        # fetch) pay nothing measurable.
        from collections import deque

        show_loss = progress and hasattr(it, "set_postfix")
        pending_losses: deque = deque(maxlen=64)
        next_loss_poll = t0 + 0.5
        # one-batch-ahead device prefetch: issue the (async) host->device
        # transfer of batch i+1 before dispatching step i, so the copy
        # overlaps compute (on tunneled devices the transfer is ~100 ms
        # per batch and otherwise serializes with the step)
        _it = iter(it)
        batch = next(_it, None)
        device_batch = self._put(batch) if batch is not None else None
        while batch is not None:
            nxt = next(_it, None)
            next_device = self._put(nxt) if nxt is not None else None
            state, metrics = self.train_step(state, device_batch)
            n_batches += 1
            n_images += next(iter(batch.values())).shape[0]
            for k, v in metrics.items():
                metric_sums[k] = v if k not in metric_sums else metric_sums[k] + v
            if show_loss and "G_loss" in metrics:
                pending_losses.append(metrics["G_loss"])
                now = time.perf_counter()
                if now >= next_loss_poll:
                    next_loss_poll = now + 0.5
                    ready = None
                    try:
                        while pending_losses and pending_losses[0].is_ready():
                            ready = pending_losses.popleft()
                        if ready is not None:
                            it.set_postfix(loss=f"{float(ready):.4f}",
                                           refresh=False)
                    except Exception:  # pragma: no cover — display only
                        show_loss = False
            last_batch = device_batch
            batch, device_batch = nxt, next_device
            if should_stop is not None and should_stop():
                break
        elapsed = time.perf_counter() - t0
        if n_batches == 0:
            return state, float("nan"), {}, None
        # single host sync per epoch
        fetched = jax.device_get(metric_sums)
        avg = {k: float(v) / n_batches for k, v in fetched.items()}
        avg["images_per_sec"] = n_images / elapsed if elapsed > 0 else 0.0
        return state, avg.get("G_loss", float("nan")), avg, last_batch

    def validate(
        self,
        state: TrainState,
        loader,
        progress: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[float, Dict[str, float], Any, Any, Any, Any]:
        """Returns (avg_loss, avg_components, last_Gx, last_Fy, last_x, last_y).

        `rng` is the validation key for stochastic (VAE-family) eval steps;
        per-batch keys are folded in from it, so metrics depend only on the
        key the driver threads (e.g. fold_in(PRNGKey(seed), epoch)), not on
        how many validate calls preceded this one.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        metric_sums: Dict[str, Any] = {}
        n_batches = 0
        last_Gx = last_Fy = last_x = last_y = None
        it = tqdm(loader, desc="Validation") if progress else loader
        for batch in it:
            device_batch = self._put(batch)
            metrics = self.eval_step(
                state, device_batch, jax.random.fold_in(rng, n_batches)
            )
            metrics = dict(metrics)
            last_Gx = metrics.pop("Gx")
            last_Fy = metrics.pop("Fy", None)
            # raw (on-device-aug) batches have no host-side x/y images
            last_x = device_batch.get("x")
            last_y = device_batch.get("y")
            n_batches += 1
            for k, v in metrics.items():
                metric_sums[k] = v if k not in metric_sums else metric_sums[k] + v
        if n_batches == 0:
            return float("nan"), {}, None, None, None, None
        fetched = jax.device_get(metric_sums)
        avg = {k: float(v) / n_batches for k, v in fetched.items()}
        return (
            avg.get("G_loss", float("nan")),
            avg,
            np.asarray(last_Gx) if last_Gx is not None else None,
            np.asarray(last_Fy) if last_Fy is not None else None,
            _to_float_image(last_x) if last_x is not None else None,
            _to_float_image(last_y) if last_y is not None else None,
        )
