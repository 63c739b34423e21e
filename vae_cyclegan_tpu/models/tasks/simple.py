"""Non-adversarial tasks: Autoencoder, VAE, DoubleAE, DoubleVAE.

Reference training semantics: Networks.py:276-413 (Autoencoder),
:855-988 (VAE), :415-605 (DoubleAutoencoder), :608-852 (DoubleVAE).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vae_cyclegan_tpu import losses
from vae_cyclegan_tpu.models.composites import DoubleAENet, DoubleVAENet
from vae_cyclegan_tpu.models.networks import (
    AutoencoderNet,
    VariationalAutoencoderNet,
)
from vae_cyclegan_tpu.models.state import TrainState
from vae_cyclegan_tpu.models.tasks.base import Task


class AutoencoderTask(Task):
    """L1(G(x), y) with a single Adam (Networks.py:334-384)."""

    name = "autoencoder"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.net = AutoencoderNet(
            self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        p_rng, s_rng = jax.random.split(rng)
        variables = self.net.init(p_rng, self._dummy_batch()["x"])
        params = {"model": variables["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params["model"])},
            rng=s_rng,
        )

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, _ = jax.random.split(state.rng)
        fwd = self._maybe_remat(
            lambda p, xx: self.net.apply({"params": p}, xx)
        )

        def loss_fn(p):
            Gx = fwd(p, x)
            return losses.translation_loss(Gx, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params["model"])
        new_p, new_opt, nan_flag = self._finite_update(
            self.tx, loss, grads, state.params["model"], state.opt_state["model"], batch=batch
        )
        metrics = {
            "G_loss": loss,
            "loss_trans": loss,
            "total_loss": loss,
            "nan_detected": nan_flag,
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"model": new_p},
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        Gx = self.net.apply({"params": state.params["model"]}, x)
        loss = losses.translation_loss(Gx, y)
        return {
            "G_loss": loss,
            "total_loss": loss,
            "loss_trans": loss,
            "Gx": Gx,
        }

    def generate(self, state, batch, rng):
        return self.net.apply({"params": state.params["model"]}, batch["x"])


class VAETask(Task):
    """L1(G(x), y) + lambda_kl * KL(mu, logvar) (Networks.py:918-988)."""

    name = "vae"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.net = VariationalAutoencoderNet(
            self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        p_rng, r_rng, s_rng = jax.random.split(rng, 3)
        variables = self.net.init(
            {"params": p_rng, "reparam": r_rng}, self._dummy_batch()["x"]
        )
        params = {"model": variables["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params["model"])},
            rng=s_rng,
        )

    def _fwd(self, p, x, key):
        return self.net.apply({"params": p}, x, rngs={"reparam": key})

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, k = jax.random.split(state.rng)
        fwd = self._maybe_remat(self._fwd)

        def loss_fn(p):
            Gx, mu, logvar = fwd(p, x, k)
            loss_trans = losses.translation_loss(Gx, y)
            loss_kl = losses.kl_divergence(mu, logvar)
            return loss_trans + self.lc.lambda_kl * loss_kl, (loss_trans, loss_kl)

        (g_loss, (loss_trans, loss_kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params["model"])
        new_p, new_opt, nan_flag = self._finite_update(
            self.tx, g_loss, grads, state.params["model"], state.opt_state["model"], batch=batch
        )
        metrics = {
            "G_loss": g_loss,
            "loss_trans": loss_trans,
            "loss_kl": loss_kl,
            "nan_detected": nan_flag,
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"model": new_p},
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        Gx, mu, logvar = self._fwd(state.params["model"], x, rng)
        loss_trans = losses.translation_loss(Gx, y)
        loss_kl = losses.kl_divergence(mu, logvar)
        total = loss_trans + self.lc.lambda_kl * loss_kl
        return {
            "G_loss": total,
            "loss_trans": loss_trans,
            "loss_kl": loss_kl,
            "Gx": Gx,
        }

    def generate(self, state, batch, rng):
        return self._fwd(state.params["model"], batch["x"], rng)[0]


class DoubleAETask(Task):
    """Shared-encoder dual reconstruction: L1(Gx,x) + L1(Gy,y)
    (Networks.py:502-580). Validation also emits the cross translations."""

    name = "doubleae"
    has_fy = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.net = DoubleAENet(self.mc.base_width, self.mc.use_pallas, self.mc.dtype)
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        p_rng, s_rng = jax.random.split(rng)
        d = self._dummy_batch()
        variables = self.net.init(p_rng, d["x"], d["y"])
        params = {"model": variables["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params["model"])},
            rng=s_rng,
        )

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, _ = jax.random.split(state.rng)
        fwd = self._maybe_remat(
            lambda p, xx, yy: self.net.apply({"params": p}, xx, yy)
        )

        def loss_fn(p):
            Gx, Gy = fwd(p, x, y)
            loss_a = losses.translation_loss(Gx, x)
            loss_b = losses.translation_loss(Gy, y)
            return loss_a + loss_b, (loss_a, loss_b)

        (total, (loss_a, loss_b)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params["model"])
        new_p, new_opt, nan_flag = self._finite_update(
            self.tx, total, grads, state.params["model"], state.opt_state["model"], batch=batch
        )
        metrics = {
            "G_loss": total,
            "loss_recon_A": loss_a,
            "loss_recon_B": loss_b,
            "total_loss": total,
            "nan_detected": nan_flag,
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"model": new_p},
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        p = {"params": state.params["model"]}
        Gx, Gy = self.net.apply(p, x, y)
        loss_a = losses.translation_loss(Gx, x)
        loss_b = losses.translation_loss(Gy, y)
        total = loss_a + loss_b
        Gx_translated = self.net.apply(p, x, method=DoubleAENet.translate_A_to_B)
        Fy_translated = self.net.apply(p, y, method=DoubleAENet.translate_B_to_A)
        return {
            "G_loss": total,
            "total_loss": total,
            "loss_recon_A": loss_a,
            "loss_recon_B": loss_b,
            "Gx": Gx_translated,
            "Fy": Fy_translated,
        }

    def generate(self, state, batch, rng):
        return self.net.apply(
            {"params": state.params["model"]}, batch["x"], batch["y"]
        )[0]


class DoubleVAETask(Task):
    """DoubleVAE pretraining: recon_A + recon_B + lambda_kl*(KL_A + KL_B)
    (Networks.py:764-852)."""

    name = "doublevae"
    has_fy = True

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.net = DoubleVAENet(
            self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.tx = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        p_rng, r_rng, s_rng = jax.random.split(rng, 3)
        d = self._dummy_batch()
        variables = self.net.init(
            {"params": p_rng, "reparam": r_rng}, d["x"], d["y"]
        )
        params = {"model": variables["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={},
            opt_state={"model": self.tx.init(params["model"])},
            rng=s_rng,
        )

    def _fwd(self, p, x, y, key):
        return self.net.apply({"params": p}, x, y, rngs={"reparam": key})

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, k = jax.random.split(state.rng)
        fwd = self._maybe_remat(self._fwd)

        def loss_fn(p):
            Gx, Gy, mu_x, lv_x, mu_y, lv_y = fwd(p, x, y, k)
            loss_a = losses.translation_loss(Gx, x)
            loss_b = losses.translation_loss(Gy, y)
            kl_a = losses.kl_divergence(mu_x, lv_x)
            kl_b = losses.kl_divergence(mu_y, lv_y)
            kl = kl_a + kl_b
            total = loss_a + loss_b + self.lc.lambda_kl * kl
            return total, (loss_a, loss_b, kl, kl_a, kl_b)

        (total, (loss_a, loss_b, kl, kl_a, kl_b)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params["model"])
        new_p, new_opt, nan_flag = self._finite_update(
            self.tx, total, grads, state.params["model"], state.opt_state["model"], batch=batch
        )
        metrics = {
            "G_loss": total,
            "loss_recon_A": loss_a,
            "loss_recon_B": loss_b,
            "loss_kl": kl,
            "loss_kl_A": kl_a,
            "loss_kl_B": kl_b,
            "total_loss": total,
            "nan_detected": nan_flag,
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"model": new_p},
                opt_state={"model": new_opt},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {"params": state.params["model"]}
        Gx, Gy, mu_x, lv_x, mu_y, lv_y = self._fwd(
            state.params["model"], x, y, k1
        )
        loss_a = losses.translation_loss(Gx, x)
        loss_b = losses.translation_loss(Gy, y)
        kl_a = losses.kl_divergence(mu_x, lv_x)
        kl_b = losses.kl_divergence(mu_y, lv_y)
        kl = kl_a + kl_b
        total = loss_a + loss_b + self.lc.lambda_kl * kl
        Gx_translated = self.net.apply(
            p, x, method=DoubleVAENet.translate_A_to_B, rngs={"reparam": k2}
        )
        Fy_translated = self.net.apply(
            p, y, method=DoubleVAENet.translate_B_to_A, rngs={"reparam": k3}
        )
        return {
            "G_loss": total,
            "total_loss": total,
            "loss_recon_A": loss_a,
            "loss_recon_B": loss_b,
            "loss_kl": kl,
            "loss_kl_A": kl_a,
            "loss_kl_B": kl_b,
            "Gx": Gx_translated,
            "Fy": Fy_translated,
        }

    def generate(self, state, batch, rng):
        return self._fwd(state.params["model"], batch["x"], batch["y"], rng)[0]
