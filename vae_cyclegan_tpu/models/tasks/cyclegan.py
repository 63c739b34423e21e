"""Adversarial cycle tasks: CycleAEGAN and the flagship CycleVAEGAN
(reference: Networks.py:1618-1869, 1872-2150).

Per step: 6 generator forwards (2 full cycles + 2 identity passes) and 8
discriminator forwards (4 in-graph, 4 on detached fakes) fused into ONE
jitted program. Optimizer_G covers F+G jointly, optimizer_D covers DX+DY
(Networks.py:1667-1677, 1926-1936). Both composites re-apply ReLU-gain
Kaiming init over all children including the discriminators
(Networks.py:1628, 1883).

CycleVAEGAN quirk preserved: its G_loss uses ONLY the fake half of the
generator GAN loss (Networks.py:2006-2014), unlike CycleAEGAN which uses the
real+fake total (Networks.py:1739-1744); its 'loss_gan_g' metric also
reports the fake half (Networks.py:2063).
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
from vae_cyclegan_tpu.models.tasks.gan import d_apply


class _CycleGANBase(Task):
    """Shared structure for CycleAEGAN / CycleVAEGAN."""

    has_fy = True
    variational = False

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        mk_gen = (
            (lambda: VariationalAutoencoderNet(
                self.mc.latent_dim, self.mc.base_width, self.mc.use_pallas,
                self.mc.dtype))
            if self.variational
            else (lambda: AutoencoderNet(
                self.mc.base_width, self.mc.use_pallas, self.mc.dtype))
        )
        self.G = mk_gen()
        self.F = mk_gen()
        mk_disc = lambda: Discriminator(  # noqa: E731
            final_kernel=self.mc.disc_final_kernel,
            base_width=self.mc.base_width,
            init_nonlinearity="relu",  # composite re-init, Networks.py:1628/1883
            use_pallas=self.mc.use_pallas,
            dtype=self.mc.dtype,
        )
        self.DX = mk_disc()
        self.DY = mk_disc()
        self.tx_g = self._adam()
        self.tx_d = self._adam()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, f_rng, r1, r2, dx_rng, dy_rng, s_rng = jax.random.split(rng, 7)
        x = self._dummy_batch()["x"]
        if self.variational:
            g_vars = self.G.init({"params": g_rng, "reparam": r1}, x)
            f_vars = self.F.init({"params": f_rng, "reparam": r2}, x)
        else:
            g_vars = self.G.init(g_rng, x)
            f_vars = self.F.init(f_rng, x)
        dx_vars = self.DX.init(dx_rng, x)
        dy_vars = self.DY.init(dy_rng, x)
        params = {
            "G": g_vars["params"],
            "F": f_vars["params"],
            "DX": dx_vars["params"],
            "DY": dy_vars["params"],
        }
        gen_group = {"G": params["G"], "F": params["F"]}
        disc_group = {"DX": params["DX"], "DY": params["DY"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            spectral={"DX": dx_vars["spectral"], "DY": dy_vars["spectral"]},
            opt_state={
                "G": self.tx_g.init(gen_group),
                "D": self.tx_d.init(disc_group),
            },
            rng=s_rng,
        )

    # generator application (overridden for the variational variant)
    def _gen_apply(self, module, p, v, key):
        del key
        out = self._maybe_remat(lambda pp, vv: module.apply({"params": pp}, vv))(p, v)
        return out, None, None

    def _gen_forward(self, pgen, x, y, key):
        """Reference forward order (Networks.py:1654-1660 / 1909-1915):
        G(x), G(y), F(Gx), F(y), F(x), G(Fy)."""
        ks = jax.random.split(key, 6)
        Gx, mu_x, lv_x = self._gen_apply(self.G, pgen["G"], x, ks[0])
        Gy, _, _ = self._gen_apply(self.G, pgen["G"], y, ks[1])
        FGx, mu_FGx, lv_FGx = self._gen_apply(self.F, pgen["F"], Gx, ks[2])
        Fy, mu_y, lv_y = self._gen_apply(self.F, pgen["F"], y, ks[3])
        Fx, _, _ = self._gen_apply(self.F, pgen["F"], x, ks[4])
        GFy, mu_GFy, lv_GFy = self._gen_apply(self.G, pgen["G"], Fy, ks[5])
        kl_terms = (mu_x, lv_x, mu_FGx, lv_FGx, mu_y, lv_y, mu_GFy, lv_GFy)
        return Gx, Gy, FGx, Fy, Fx, GFy, kl_terms

    def _kl(self, kl_terms):
        if not self.variational:
            return None
        mu_x, lv_x, mu_FGx, lv_FGx, mu_y, lv_y, mu_GFy, lv_GFy = kl_terms
        return (
            losses.kl_divergence(mu_x, lv_x)
            + losses.kl_divergence(mu_FGx, lv_FGx)
            + losses.kl_divergence(mu_y, lv_y)
            + losses.kl_divergence(mu_GFy, lv_GFy)
        )

    def _g_total(self, loss_cycle, gan_parts, loss_kl, loss_identity):
        """Per-architecture G_loss assembly (differs between the two)."""
        raise NotImplementedError

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        x, y = batch["x"], batch["y"]
        rng, k = jax.random.split(state.rng)
        pDX, pDY = state.params["DX"], state.params["DY"]
        spDX, spDY = state.spectral["DX"], state.spectral["DY"]

        def g_loss_fn(pgen):
            Gx, Gy, FGx, Fy, Fx, GFy, kl_terms = self._gen_forward(pgen, x, y, k)
            # in-graph D calls, reference order: DY(Gx), DX(Fy), DX(x), DY(y)
            DYGx, spY1 = d_apply(self.DY, pDY, spDY, Gx, update=True)
            DXFy, spX1 = d_apply(self.DX, pDX, spDX, Fy, update=True)
            DXx, spX2 = d_apply(self.DX, pDX, spX1, x, update=True)
            DYy, spY2 = d_apply(self.DY, pDY, spY1, y, update=True)

            loss_cycle = losses.cycle_consistency_loss(x, y, FGx, GFy)
            gan_g_x, gan_g_x_real, gan_g_x_fake = losses.gan_loss_generator(
                DXx, DXFy
            )
            gan_g_y, gan_g_y_real, gan_g_y_fake = losses.gan_loss_generator(
                DYy, DYGx
            )
            loss_kl = self._kl(kl_terms)
            loss_identity = (
                losses.identity_loss(x, y, Fx, Gy) if self.paired else None
            )
            gan_parts = (
                gan_g_x, gan_g_x_real, gan_g_x_fake,
                gan_g_y, gan_g_y_real, gan_g_y_fake,
            )
            g_loss = self._g_total(loss_cycle, gan_parts, loss_kl, loss_identity)
            aux = (
                Gx, Fy, spX2, spY2, loss_cycle, gan_parts, loss_kl, loss_identity
            )
            return g_loss, aux

        gen_group = {"G": state.params["G"], "F": state.params["F"]}
        (g_loss, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gen_group
        )
        Gx, Fy, spX2, spY2, loss_cycle, gan_parts, loss_kl, loss_identity = aux
        new_gen, new_opt_g, nan_g = self._finite_update(
            self.tx_g, g_loss, grads_g, gen_group, state.opt_state["G"], batch=batch
        )

        Gx_sg = jax.lax.stop_gradient(Gx)
        Fy_sg = jax.lax.stop_gradient(Fy)

        def d_loss_fn(pdisc):
            # detached D calls, reference order (Networks.py:2032-2035):
            # DY(Gx_det), DX(Fy_det), DX(x), DY(y)
            DYGx_d, spY3 = d_apply(self.DY, pdisc["DY"], spY2, Gx_sg, update=True)
            DXFy_d, spX3 = d_apply(self.DX, pdisc["DX"], spX2, Fy_sg, update=True)
            DXx_d, spX4 = d_apply(self.DX, pdisc["DX"], spX3, x, update=True)
            DYy_d, spY4 = d_apply(self.DY, pdisc["DY"], spY3, y, update=True)
            gan_d_x, d_x_real, d_x_fake = losses.gan_loss_discriminator(
                DXx_d, DXFy_d
            )
            gan_d_y, d_y_real, d_y_fake = losses.gan_loss_discriminator(
                DYy_d, DYGx_d
            )
            d_loss = gan_d_x + gan_d_y
            aux_d = (
                spX4, spY4, d_x_real, d_x_fake, d_y_real, d_y_fake,
                jnp.mean(DXx_d), jnp.mean(DXFy_d), jnp.mean(DYy_d),
                jnp.mean(DYGx_d),
            )
            return d_loss, aux_d

        disc_group = {"DX": pDX, "DY": pDY}
        (d_loss, aux_d), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
            disc_group
        )
        (spX4, spY4, d_x_real, d_x_fake, d_y_real, d_y_fake,
         d_x_real_mean, d_x_fake_mean, d_y_real_mean, d_y_fake_mean) = aux_d
        new_disc, new_opt_d, nan_d = self._finite_update(
            self.tx_d, d_loss, grads_d, disc_group, state.opt_state["D"], batch=batch
        )

        (gan_g_x, gan_g_x_real, gan_g_x_fake,
         gan_g_y, gan_g_y_real, gan_g_y_fake) = gan_parts
        metrics = {
            "total_loss": g_loss + d_loss,
            "G_loss": g_loss,
            "D_loss": d_loss,
            "D_loss_x_real": d_x_real,
            "D_loss_x_fake": d_x_fake,
            "D_loss_y_real": d_y_real,
            "D_loss_y_fake": d_y_fake,
            "loss_cycle": loss_cycle,
            "loss_gan_g": self._gan_g_metric(gan_parts),
            "loss_gan_g_x_real": gan_g_x_real,
            "loss_gan_g_x_fake": gan_g_x_fake,
            "loss_gan_g_y_real": gan_g_y_real,
            "loss_gan_g_y_fake": gan_g_y_fake,
            "d_x_real_mean": d_x_real_mean,
            "d_x_fake_mean": d_x_fake_mean,
            "d_y_real_mean": d_y_real_mean,
            "d_y_fake_mean": d_y_fake_mean,
            "nan_detected": jnp.maximum(nan_g, nan_d),
        }
        if self.variational:
            metrics["loss_kl"] = loss_kl
        if self.paired:
            metrics["loss_identity"] = loss_identity

        return (
            state.replace(
                step=state.step + 1,
                params={
                    "G": new_gen["G"],
                    "F": new_gen["F"],
                    "DX": new_disc["DX"],
                    "DY": new_disc["DY"],
                },
                spectral={"DX": spX4, "DY": spY4},
                opt_state={"G": new_opt_g, "D": new_opt_d},
                rng=rng,
            ),
            metrics,
        )

    def eval_step(self, state, batch, rng):
        x, y = batch["x"], batch["y"]
        pgen = {"G": state.params["G"], "F": state.params["F"]}
        pDX, pDY = state.params["DX"], state.params["DY"]
        spDX, spDY = state.spectral["DX"], state.spectral["DY"]
        Gx, Gy, FGx, Fy, Fx, GFy, kl_terms = self._gen_forward(pgen, x, y, rng)
        DYGx, _ = d_apply(self.DY, pDY, spDY, Gx, update=False)
        DXFy, _ = d_apply(self.DX, pDX, spDX, Fy, update=False)
        DXx, _ = d_apply(self.DX, pDX, spDX, x, update=False)
        DYy, _ = d_apply(self.DY, pDY, spDY, y, update=False)

        loss_cycle = losses.cycle_consistency_loss(x, y, FGx, GFy)
        gan_g_x, gan_g_x_real, gan_g_x_fake = losses.gan_loss_generator(DXx, DXFy)
        gan_g_y, gan_g_y_real, gan_g_y_fake = losses.gan_loss_generator(DYy, DYGx)
        loss_kl = self._kl(kl_terms)
        loss_identity = losses.identity_loss(x, y, Fx, Gy) if self.paired else None
        gan_parts = (
            gan_g_x, gan_g_x_real, gan_g_x_fake,
            gan_g_y, gan_g_y_real, gan_g_y_fake,
        )
        g_loss = self._g_total(loss_cycle, gan_parts, loss_kl, loss_identity)
        gan_d_x, d_x_real, d_x_fake = losses.gan_loss_discriminator(DXx, DXFy)
        gan_d_y, d_y_real, d_y_fake = losses.gan_loss_discriminator(DYy, DYGx)
        d_loss = gan_d_x + gan_d_y

        metrics = {
            "total_loss": g_loss + d_loss,
            "G_loss": g_loss,
            "D_loss": d_loss,
            "D_loss_x_real": d_x_real,
            "D_loss_x_fake": d_x_fake,
            "D_loss_y_real": d_y_real,
            "D_loss_y_fake": d_y_fake,
            "loss_cycle": loss_cycle,
            "loss_gan_g": self._gan_g_metric(gan_parts),
            "loss_gan_g_x_real": gan_g_x_real,
            "loss_gan_g_x_fake": gan_g_x_fake,
            "loss_gan_g_y_real": gan_g_y_real,
            "loss_gan_g_y_fake": gan_g_y_fake,
            "Gx": Gx,
            "Fy": Fy,
        }
        if self.variational:
            metrics["loss_kl"] = loss_kl
        if self.paired:
            metrics["loss_identity"] = loss_identity
        return metrics

    def generate(self, state, batch, rng):
        out, _, _ = self._gen_apply(self.G, state.params["G"], batch["x"], rng)
        return out

    def _gan_g_metric(self, gan_parts):
        raise NotImplementedError


class CycleAEGANTask(_CycleGANBase):
    """G_loss = lambda_cycle*cycle + lambda_gan*(gan_g_x + gan_g_y)
    [+ lambda_id*identity if paired] (Networks.py:1737-1752)."""

    name = "cycleaegan"
    variational = False

    def _g_total(self, loss_cycle, gan_parts, loss_kl, loss_identity):
        gan_g_x, _, _, gan_g_y, _, _ = gan_parts
        g_loss = (
            self.lc.lambda_cycle * loss_cycle
            + self.lc.lambda_gan * (gan_g_x + gan_g_y)
        )
        if self.paired:
            g_loss = g_loss + self.lc.lambda_identity * loss_identity
        return g_loss

    def _gan_g_metric(self, gan_parts):
        gan_g_x, _, _, gan_g_y, _, _ = gan_parts
        return gan_g_x + gan_g_y


class CycleVAEGANTask(_CycleGANBase):
    """The flagship. G_loss = lambda_cycle*cycle + lambda_gan*(fake terms
    only) + lambda_kl*KL [+ lambda_id*identity] (Networks.py:2012-2018);
    the 'loss_gan_g' metric reports the fake half (Networks.py:2063)."""

    name = "cyclevaegan"
    variational = True

    def _gen_apply(self, module, p, v, key):
        fwd = self._maybe_remat(
            lambda pp, vv, kk: module.apply(
                {"params": pp}, vv, rngs={"reparam": kk}
            )
        )
        return fwd(p, v, key)

    def _g_total(self, loss_cycle, gan_parts, loss_kl, loss_identity):
        _, _, gan_g_x_fake, _, _, gan_g_y_fake = gan_parts
        g_loss = (
            self.lc.lambda_cycle * loss_cycle
            + self.lc.lambda_gan * (gan_g_x_fake + gan_g_y_fake)
            + self.lc.lambda_kl * loss_kl
        )
        if self.paired:
            g_loss = g_loss + self.lc.lambda_identity * loss_identity
        return g_loss

    def _gan_g_metric(self, gan_parts):
        _, _, gan_g_x_fake, _, _, gan_g_y_fake = gan_parts
        return gan_g_x_fake + gan_g_y_fake
