"""Cycle-consistency tasks without discriminators: CycleAE, CycleVAE
(reference: Networks.py:1350-1615).

Both use ONE Adam over the union of G and F parameters
(Networks.py:1370-1373, 1496-1499); 'paired' adds translation losses.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vae_cyclegan_tpu import losses
from vae_cyclegan_tpu.models.networks import (
    AutoencoderNet,
    VariationalAutoencoderNet,
)
from vae_cyclegan_tpu.models.state import TrainState
from vae_cyclegan_tpu.models.tasks.base import Task


class CycleAETask(Task):
    """G, F autoencoders; loss = lambda_cycle*cycle (+ trans if paired)
    (Networks.py:1397-1439)."""

    name = "cycleae"
    has_fy = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.G = AutoencoderNet(self.mc.base_width, self.mc.use_pallas, self.mc.dtype)
        self.F = AutoencoderNet(self.mc.base_width, self.mc.use_pallas, self.mc.dtype)
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, f_rng, s_rng = jax.random.split(rng, 3)
        x = self._dummy_batch()["x"]
        params = {
            "G": self.G.init(g_rng, x)["params"],
            "F": self.F.init(f_rng, x)["params"],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params)},
            rng=s_rng,
        )

    def _forward(self, params, x, y):
        g_fwd = self._maybe_remat(lambda p, v: self.G.apply({"params": p}, v))
        f_fwd = self._maybe_remat(lambda p, v: self.F.apply({"params": p}, v))
        Gx = g_fwd(params["G"], x)
        FGx = f_fwd(params["F"], Gx)
        Fy = f_fwd(params["F"], y)
        GFy = g_fwd(params["G"], Fy)
        return Gx, FGx, Fy, GFy

    def _losses(self, x, y, Gx, FGx, Fy, GFy):
        loss_cycle = losses.cycle_consistency_loss(x, y, FGx, GFy)
        total = self.lc.lambda_cycle * loss_cycle
        loss_trans = None
        if self.paired:
            loss_trans = losses.translation_loss(
                Gx, y
            ) + losses.translation_loss(Fy, x)
            total = total + loss_trans
        return total, loss_cycle, loss_trans

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            Gx, FGx, Fy, GFy = self._forward(params, x, y)
            total, loss_cycle, loss_trans = self._losses(x, y, Gx, FGx, Fy, GFy)
            return total, (loss_cycle, loss_trans)

        (total, (loss_cycle, loss_trans)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_params, new_opt, nan_flag = self._finite_update(
            self.tx, total, grads, state.params, state.opt_state["model"], batch=batch
        )
        metrics = {
            "total_loss": total,
            "loss_cycle": loss_cycle,
            "G_loss": total,
            "nan_detected": nan_flag,
        }
        if self.paired:
            metrics["loss_trans"] = loss_trans
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        Gx, FGx, Fy, GFy = self._forward(state.params, x, y)
        total, loss_cycle, loss_trans = self._losses(x, y, Gx, FGx, Fy, GFy)
        metrics = {
            "total_loss": total,
            "loss_cycle": loss_cycle,
            "G_loss": total,
            "Gx": Gx,
            "Fy": Fy,
        }
        if self.paired:
            metrics["loss_trans"] = loss_trans
        return metrics

    def generate(self, state, batch, rng):
        return self.G.apply({"params": state.params["G"]}, batch["x"])


class CycleVAETask(Task):
    """G, F VAEs; adds 4 KL terms (x, FGx, y, GFy) (Networks.py:1525-1615)."""

    name = "cyclevae"
    has_fy = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.G = VariationalAutoencoderNet(
            self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.F = VariationalAutoencoderNet(
            self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, f_rng, r1, r2, s_rng = jax.random.split(rng, 5)
        x = self._dummy_batch()["x"]
        params = {
            "G": self.G.init({"params": g_rng, "reparam": r1}, x)["params"],
            "F": self.F.init({"params": f_rng, "reparam": r2}, x)["params"],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params)},
            rng=s_rng,
        )

    def _forward(self, params, x, y, key):
        """Reference order (Networks.py:1489-1494): G(x), F(Gx), F(y), G(Fy)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        g_fwd = self._maybe_remat(
            lambda p, v, k: self.G.apply({"params": p}, v, rngs={"reparam": k})
        )
        f_fwd = self._maybe_remat(
            lambda p, v, k: self.F.apply({"params": p}, v, rngs={"reparam": k})
        )
        Gx, mu_x, lv_x = g_fwd(params["G"], x, k1)
        FGx, mu_FGx, lv_FGx = f_fwd(params["F"], Gx, k2)
        Fy, mu_y, lv_y = f_fwd(params["F"], y, k3)
        GFy, mu_GFy, lv_GFy = g_fwd(params["G"], Fy, k4)
        return (
            Gx, FGx, Fy, GFy,
            mu_x, lv_x, mu_FGx, lv_FGx, mu_y, lv_y, mu_GFy, lv_GFy,
        )

    def _losses(self, x, y, fwd_out):
        (Gx, FGx, Fy, GFy,
         mu_x, lv_x, mu_FGx, lv_FGx, mu_y, lv_y, mu_GFy, lv_GFy) = fwd_out
        loss_cycle = losses.cycle_consistency_loss(x, y, FGx, GFy)
        loss_kl = (
            losses.kl_divergence(mu_x, lv_x)
            + losses.kl_divergence(mu_FGx, lv_FGx)
            + losses.kl_divergence(mu_y, lv_y)
            + losses.kl_divergence(mu_GFy, lv_GFy)
        )
        total = self.lc.lambda_cycle * loss_cycle + self.lc.lambda_kl * loss_kl
        loss_trans = None
        if self.paired:
            loss_trans = losses.translation_loss(
                Gx, y
            ) + losses.translation_loss(Fy, x)
            total = total + loss_trans
        return total, loss_cycle, loss_kl, loss_trans

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, k = jax.random.split(state.rng)

        def loss_fn(params):
            fwd_out = self._forward(params, x, y, k)
            total, loss_cycle, loss_kl, loss_trans = self._losses(x, y, fwd_out)
            return total, (loss_cycle, loss_kl, loss_trans)

        (total, (loss_cycle, loss_kl, loss_trans)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_params, new_opt, nan_flag = self._finite_update(
            self.tx, total, grads, state.params, state.opt_state["model"], batch=batch
        )
        metrics = {
            "total_loss": total,
            "loss_cycle": loss_cycle,
            "loss_kl": loss_kl,
            "G_loss": total,
            "nan_detected": nan_flag,
        }
        if self.paired:
            metrics["loss_trans"] = loss_trans
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        fwd_out = self._forward(state.params, x, y, rng)
        total, loss_cycle, loss_kl, loss_trans = self._losses(x, y, fwd_out)
        metrics = {
            "total_loss": total,
            "loss_cycle": loss_cycle,
            "loss_kl": loss_kl,
            "G_loss": total,
            "Gx": fwd_out[0],
            "Fy": fwd_out[2],
        }
        if self.paired:
            metrics["loss_trans"] = loss_trans
        return metrics

    def generate(self, state, batch, rng):
        return self.G.apply(
            {"params": state.params["G"]}, batch["x"], rngs={"reparam": rng}
        )[0]
