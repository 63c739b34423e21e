"""Adversarial tasks: AEGAN and VAEGAN (reference: Networks.py:991-1347).

Both alternate a generator update and a discriminator update. In the TPU
build both updates fuse into ONE jitted step: G grads are taken w.r.t.
generator params with D params held constant, then D grads are taken on
stop_gradient'ed fakes from the *pre-update* generator — exactly the
reference's detach-and-recompute semantics (Networks.py:1106-1119 for AEGAN;
VAEGAN instead reuses the shared forward with retain_graph,
Networks.py:1269-1289).

Spectral-norm power-iteration bookkeeping: torch updates (u, v) once per
training D forward. AEGAN calls D four times per step (2 in-graph + 2
detached) => 4 iterations persisted; VAEGAN calls D twice (shared forward)
=> 2 iterations persisted. The (u, v) chain is threaded through D applies in
the reference's call order.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vae_cyclegan_tpu import losses
from vae_cyclegan_tpu.models.networks import (
    AutoencoderNet,
    Discriminator,
    VariationalAutoencoderNet,
)
from vae_cyclegan_tpu.models.state import TrainState
from vae_cyclegan_tpu.models.tasks.base import Task


def d_apply(disc: Discriminator, params_d, spectral, x, update: bool):
    """Apply a discriminator, returning (scores, new_spectral_collection)."""
    variables = {"params": params_d, "spectral": spectral}
    if update:
        out, mut = disc.apply(variables, x, update_stats=True, mutable=["spectral"])
        return out, mut["spectral"]
    out = disc.apply(variables, x, update_stats=False)
    return out, spectral


class AEGANTask(Task):
    """G = Autoencoder, D = global Discriminator (Networks.py:991-1187).

    G step: L1(Gx,y) + lambda_gan*(MSE(Dy,0)+MSE(DGx,1)) + lambda_id*L1(Gy,y).
    D step on detached Gx: MSE(Dy,1) + MSE(DGx,0).
    The composite re-applies ReLU-gain Kaiming init over ALL children
    including D (Networks.py:999,1011-1021), hence init_nonlinearity='relu'.
    """

    name = "aegan"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.G = AutoencoderNet(self.mc.base_width, self.mc.use_pallas, self.mc.dtype)
        self.D = Discriminator(
            final_kernel=self.mc.disc_final_kernel,
            base_width=self.mc.base_width,
            init_nonlinearity="relu",
            use_pallas=self.mc.use_pallas,
            dtype=self.mc.dtype,
        )
        self.tx_g = self._adam()
        self.tx_d = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        x = self._dummy_batch()["x"]
        g_vars = self.G.init(g_rng, x)
        d_vars = self.D.init(d_rng, x)
        params = {"G": g_vars["params"], "D": d_vars["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={"D": d_vars["spectral"]},
            opt_state={
                "G": self.tx_g.init(params["G"]),
                "D": self.tx_d.init(params["D"]),
            },
            rng=s_rng,
        )

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, _ = jax.random.split(state.rng)
        pD = state.params["D"]
        spD = state.spectral["D"]
        g_fwd = self._maybe_remat(lambda p, xx: self.G.apply({"params": p}, xx))

        def g_loss_fn(pg):
            Gx = g_fwd(pg, x)
            Gy = g_fwd(pg, y)
            DGx, sp1 = d_apply(self.D, pD, spD, Gx, update=True)
            Dy, sp2 = d_apply(self.D, pD, sp1, y, update=True)
            loss_trans = losses.translation_loss(Gx, y)
            gan_tot, _, _ = losses.gan_loss_generator(Dy, DGx)
            loss_id = losses.translation_loss(Gy, y)
            g_loss = (
                loss_trans
                + self.lc.lambda_gan * gan_tot
                + self.lc.lambda_identity * loss_id
            )
            return g_loss, (Gx, sp2, loss_trans, gan_tot, loss_id)

        (g_loss, (Gx, sp2, loss_trans, gan_tot, loss_id)), grads_g = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params["G"])
        )
        new_pg, new_opt_g, nan_g = self._finite_update(
            self.tx_g, g_loss, grads_g, state.params["G"], state.opt_state["G"], batch=batch
        )

        Gx_sg = jax.lax.stop_gradient(Gx)

        def d_loss_fn(pd):
            DGx_d, sp3 = d_apply(self.D, pd, sp2, Gx_sg, update=True)
            Dy_d, sp4 = d_apply(self.D, pd, sp3, y, update=True)
            d_loss, d_real, d_fake = losses.gan_loss_discriminator(Dy_d, DGx_d)
            return d_loss, (sp4, d_real, d_fake, jnp.mean(Dy_d), jnp.mean(DGx_d))

        (d_loss, (sp4, d_real, d_fake, d_y_mean, d_gx_mean)), grads_d = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(pD)
        )
        new_pd, new_opt_d, nan_d = self._finite_update(
            self.tx_d, d_loss, grads_d, pD, state.opt_state["D"], batch=batch
        )

        metrics = {
            "G_loss": g_loss,
            "D_loss": d_loss,
            "D_loss_real": d_real,
            "D_loss_fake": d_fake,
            "loss_trans": loss_trans,
            "loss_gan_g": gan_tot,
            "loss_identity": loss_id,
            "d_y_mean": d_y_mean,
            "d_gx_mean": d_gx_mean,
            "nan_detected": jnp.maximum(nan_g, nan_d),
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"G": new_pg, "D": new_pd},
                spectral={"D": sp4},
                opt_state={"G": new_opt_g, "D": new_opt_d},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        pG, pD, spD = state.params["G"], state.params["D"], state.spectral["D"]
        Gx = self.G.apply({"params": pG}, x)
        Gy = self.G.apply({"params": pG}, y)
        DGx, _ = d_apply(self.D, pD, spD, Gx, update=False)
        Dy, _ = d_apply(self.D, pD, spD, y, update=False)
        loss_trans = losses.translation_loss(Gx, y)
        gan_tot, gan_r, gan_f = losses.gan_loss_generator(Dy, DGx)
        loss_id = losses.translation_loss(Gy, y)
        g_loss = (
            loss_trans
            + self.lc.lambda_gan * gan_tot
            + self.lc.lambda_identity * loss_id
        )
        d_loss, d_real, d_fake = losses.gan_loss_discriminator(Dy, DGx)
        return {
            "total_loss": g_loss + d_loss,
            "G_loss": g_loss,
            "D_loss": d_loss,
            "D_loss_real": d_real,
            "D_loss_fake": d_fake,
            "loss_trans": loss_trans,
            "loss_gan_g": gan_tot,
            "loss_gan_g_real": gan_r,
            "loss_gan_g_fake": gan_f,
            "loss_identity": loss_id,
            "Gx": Gx,
        }

    def generate(self, state, batch, rng):
        return self.G.apply({"params": state.params["G"]}, batch["x"])


class VAEGANTask(Task):
    """G = VariationalAutoencoder, D = Discriminator (Networks.py:1190-1347).

    Single shared forward; G_loss = lambda_recon*L1 + lambda_gan*gan_gen +
    lambda_id*L1(Gy,y) + lambda_kl*KL. D loss on the SAME Dy/DGx tensors with
    DGx detached (no recompute, Networks.py:1280) => only 2 spectral
    iterations persist per step. VAEGAN's __init__ never re-applies an init
    (no self.apply), so D keeps its LeakyReLU-gain Kaiming init.
    """

    name = "vaegan"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.G = VariationalAutoencoderNet(
            self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas, self.mc.dtype
        )
        self.D = Discriminator(
            final_kernel=self.mc.disc_final_kernel,
            base_width=self.mc.base_width,
            init_nonlinearity="leaky_relu",
            use_pallas=self.mc.use_pallas,
            dtype=self.mc.dtype,
        )
        self.tx_g = self._adam()
        self.tx_d = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, r_rng, d_rng, s_rng = jax.random.split(rng, 4)
        x = self._dummy_batch()["x"]
        g_vars = self.G.init({"params": g_rng, "reparam": r_rng}, x)
        d_vars = self.D.init(d_rng, x)
        params = {"G": g_vars["params"], "D": d_vars["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={"D": d_vars["spectral"]},
            opt_state={
                "G": self.tx_g.init(params["G"]),
                "D": self.tx_d.init(params["D"]),
            },
            rng=s_rng,
        )

    def _g_fwd(self, p, x, key):
        return self.G.apply({"params": p}, x, rngs={"reparam": key})

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, k1, k2 = jax.random.split(state.rng, 3)
        pD = state.params["D"]
        spD = state.spectral["D"]
        g_fwd = self._maybe_remat(self._g_fwd)

        def g_loss_fn(pg):
            Gx, mu, logvar = g_fwd(pg, x, k1)
            Gy, _, _ = g_fwd(pg, y, k2)
            DGx, sp1 = d_apply(self.D, pD, spD, Gx, update=True)
            Dy, sp2 = d_apply(self.D, pD, sp1, y, update=True)
            loss_trans = losses.translation_loss(Gx, y)
            gan_tot, gan_r, gan_f = losses.gan_loss_generator(Dy, DGx)
            loss_id = losses.translation_loss(Gy, y)
            loss_kl = losses.kl_divergence(mu, logvar)
            g_loss = (
                self.lc.lambda_recon * loss_trans
                + self.lc.lambda_gan * gan_tot
                + self.lc.lambda_identity * loss_id
                + self.lc.lambda_kl * loss_kl
            )
            return g_loss, (Gx, sp1, sp2, loss_trans, gan_r, gan_f, loss_id, loss_kl)

        (g_loss, (Gx, sp1, sp2, loss_trans, gan_r, gan_f, loss_id, loss_kl)), grads_g = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params["G"])
        )
        new_pg, new_opt_g, nan_g = self._finite_update(
            self.tx_g, g_loss, grads_g, state.params["G"], state.opt_state["G"], batch=batch
        )

        Gx_sg = jax.lax.stop_gradient(Gx)

        def d_loss_fn(pd):
            # Re-run the SAME (u,v) chains as the shared forward so sigma
            # values match the tensors torch reuses via retain_graph.
            DGx_d, _ = d_apply(self.D, pd, spD, Gx_sg, update=True)
            Dy_d, _ = d_apply(self.D, pd, sp1, y, update=True)
            d_loss, d_real, d_fake = losses.gan_loss_discriminator(Dy_d, DGx_d)
            return d_loss, (d_real, d_fake)

        (d_loss, (d_real, d_fake)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(pD)
        new_pd, new_opt_d, nan_d = self._finite_update(
            self.tx_d, d_loss, grads_d, pD, state.opt_state["D"], batch=batch
        )

        metrics = {
            "G_loss": g_loss,
            "D_loss": d_loss,
            "loss_gan_disc_real": d_real,
            "loss_gan_disc_fake": d_fake,
            "loss_trans": loss_trans,
            "loss_gan_real": gan_r,
            "loss_gan_fake": gan_f,
            "loss_identity": loss_id,
            "loss_kl": loss_kl,
            "nan_detected": jnp.maximum(nan_g, nan_d),
        }
        return (
            state.replace(
                step=state.step + 1,
                params={"G": new_pg, "D": new_pd},
                spectral={"D": sp2},
                opt_state={"G": new_opt_g, "D": new_opt_d},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        k1, k2 = jax.random.split(rng)
        pG, pD, spD = state.params["G"], state.params["D"], state.spectral["D"]
        Gx, mu, logvar = self._g_fwd(pG, x, k1)
        Gy, _, _ = self._g_fwd(pG, y, k2)
        DGx, _ = d_apply(self.D, pD, spD, Gx, update=False)
        Dy, _ = d_apply(self.D, pD, spD, y, update=False)
        loss_trans = losses.translation_loss(Gx, y)
        gan_tot, gan_r, gan_f = losses.gan_loss_generator(Dy, DGx)
        loss_id = losses.translation_loss(Gy, y)
        loss_kl = losses.kl_divergence(mu, logvar)
        g_loss = (
            self.lc.lambda_recon * loss_trans
            + self.lc.lambda_gan * gan_tot
            + self.lc.lambda_identity * loss_id
            + self.lc.lambda_kl * loss_kl
        )
        d_loss, _, _ = losses.gan_loss_discriminator(Dy, DGx)
        return {
            "total_loss": g_loss + d_loss,
            "G_loss": g_loss,
            "D_loss": d_loss,
            "loss_trans": loss_trans,
            "loss_gan_real": gan_r,
            "loss_gan_fake": gan_f,
            "loss_identity": loss_id,
            "loss_kl": loss_kl,
            "Gx": Gx,
        }

    def generate(self, state, batch, rng):
        return self._g_fwd(state.params["G"], batch["x"], rng)[0]
