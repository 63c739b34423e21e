"""Molecular networks (reference: Networks.py §2, lines 152-271).

NHWC Flax modules. Shape contract at image_size=256 (verified by the
reference smoke tests, Networks.py:2163-2195):

  Encoder:       (B, 256, 256, 3)  -> (B, 16, 16, 1024)
  Decoder:       (B, 16, 16, 1024) -> (B, 256, 256, 3)   [unbounded output]
  VarEncBlock:   (B, 16, 16, 1024) -> z/mu/logvar (B, 16, 16, latent_dim)
  VarDecBlock:   (B, 16, 16, latent) -> (B, 16, 16, 1024)
  Discriminator: (B, 256, 256, 3)  -> (B,)  one scalar per image
                 (a *global* discriminator whose final kernel covers the
                  whole 16x16 map — not a 70x70 PatchGAN; Networks.py:248)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_cyclegan_tpu.models.blocks import (
    CaSb,
    DBlock,
    LConv,
    RBlock,
    ReflectConv,
    SConv,
    UBlock,
)
from vae_cyclegan_tpu.ops import kaiming_normal_fan_out, spectral_normalize

Dtype = Any


class Encoder(nn.Module):
    """CaSb(3->64, k7) -> D x4 (64->128->256->512->1024) -> R(1024).

    Ref: Networks.py:154-181. Kaiming fan_out 'relu' init everywhere.
    """

    base_width: int = 64
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.base_width
        x = CaSb(w, kernel_size=7, stride=1, padding=3,
                 use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = DBlock(w * 2, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = DBlock(w * 4, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = DBlock(w * 8, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = DBlock(w * 16, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = RBlock(w * 16, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        return x


class Decoder(nn.Module):
    """R(1024) -> U x4 (1024->512->256->128->64) -> CaSb(64->3, k7, Identity, no norm).

    Output is unbounded (no Tanh); the driver clamps to [0,1] only for display,
    matching the reference (Networks.py:183-211, train.py:552-554).
    """

    base_width: int = 64
    out_channels: int = 3
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from vae_cyclegan_tpu.ops.starved_conv import cm_engaged

        w = self.base_width
        dtype = self.dtype or x.dtype
        x = RBlock(w * 16, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = UBlock(w * 8, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = UBlock(w * 4, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        x = UBlock(w * 2, use_pallas=self.use_pallas, dtype=self.dtype)(x)
        # U4 -> IN -> tail: when both convs take the Pallas kernels, the
        # tensors between them stay channel-major (kernel-native layout),
        # eliding two full-tensor transposes per pass
        n, h4, w4, _ = x.shape
        hw = (2 * h4, 2 * w4)
        cm = (cm_engaged((n, *hw, w // 2), (3, 3, w // 2, w), dtype)
              and cm_engaged((n, *hw, w), (7, 7, w, self.out_channels),
                             dtype))
        x = UBlock(w, use_pallas=self.use_pallas, dtype=self.dtype,
                   cm_out=cm)(x)
        x = CaSb(self.out_channels, kernel_size=7, stride=1, padding=3,
                 activation="Identity", use_norm=False,
                 use_pallas=self.use_pallas, dtype=self.dtype,
                 cm_in=cm)(x)
        return x


class VariationalEncoderBlock(nn.Module):
    """mu = L(in->latent); logvar = S->S stack; z = mu + eps * exp(0.5*logvar).

    logvar clamped to [-10, 10] for stability. The latent is *spatial*:
    (B, 16, 16, latent_dim). Noise comes from the 'reparam' RNG stream
    (replacing torch.randn_like, Networks.py:214-227) — sampled in all modes,
    exactly like the reference (its forward always samples, even in eval).
    """

    latent_dim: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        mu = LConv(self.latent_dim, dtype=self.dtype)(x)
        lv = SConv(self.latent_dim, dtype=self.dtype)(x)
        lv = SConv(self.latent_dim, dtype=self.dtype)(lv)
        logvar = jnp.clip(lv, -10.0, 10.0)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        # dp_normal == jax.random.normal outside the engine's shard_map
        # step; inside it, the noise is drawn at GLOBAL batch positions
        # (and this shard's rows sliced) so the values are identical to
        # the single-device program — see parallel.dp.
        from vae_cyclegan_tpu.parallel.dp import dp_normal

        eps = dp_normal(self.make_rng("reparam"), std.shape, jnp.float32)
        z = mu.astype(jnp.float32) + eps * std
        return z.astype(mu.dtype), mu, logvar


class VariationalDecoderBlock(nn.Module):
    """Single S conv projecting z (latent) back to 1024 ch (Networks.py:230-237)."""

    out_channels: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        return SConv(self.out_channels, dtype=self.dtype)(z)


class SpectralConv(nn.Module):
    """Conv with spectral normalization on the kernel (power-iteration state).

    Replaces torch.nn.utils.spectral_norm(nn.Conv2d(512, 1, 16)) at
    Networks.py:248. The (u, v) vectors live in the 'spectral' variable
    collection; one power iteration runs per call when `update_stats=True`
    (the collection must then be mutable in `.apply`).
    """

    features: int
    kernel_size: int
    kernel_init_nonlinearity: str = "leaky_relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        kshape = (self.kernel_size, self.kernel_size, cin, self.features)
        kernel = self.param(
            "kernel", kaiming_normal_fan_out(self.kernel_init_nonlinearity), kshape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        n = self.kernel_size * self.kernel_size * cin

        def _unit_normal(key, shape):
            g = jax.random.normal(key, shape, jnp.float32)
            return g / (jnp.linalg.norm(g) + 1e-12)

        u = self.variable("spectral", "u", _unit_normal, self.make_rng("params")
                          if self.is_initializing() else None, (self.features,))
        v = self.variable("spectral", "v", _unit_normal, self.make_rng("params")
                          if self.is_initializing() else None, (n,))

        w_sn, new_u, new_v = spectral_normalize(kernel, u.value, v.value, update_stats)
        if update_stats and not self.is_initializing():
            u.value = new_u
            v.value = new_v

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            w_sn.astype(self.dtype or x.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class Discriminator(nn.Module):
    """4x CaSb(k4, s2, p1, LeakyReLU) 3->64->128->256->512 (first without norm)
    -> spectral_norm conv(512->1, k=image_size//16) -> (B,).

    Ref: Networks.py:240-271. One scalar per image (global discriminator).
    `init_nonlinearity` is 'leaky_relu' per the reference's own init
    (Networks.py:255-265), but composites that re-apply a ReLU-gain init over
    all children (AEGAN Networks.py:999, CycleAEGAN :1628, CycleVAEGAN :1883)
    construct it with 'relu'. VAEGAN never re-inits (no self.apply in its
    __init__), so it keeps 'leaky_relu'.
    """

    final_kernel: int = 16
    base_width: int = 64
    init_nonlinearity: str = "leaky_relu"
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        w = self.base_width
        common = dict(
            kernel_size=4,
            stride=2,
            padding=1,
            activation="LeakyReLU",
            kernel_init_nonlinearity=self.init_nonlinearity,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )
        x = CaSb(w, use_norm=False, **common)(x)
        x = CaSb(w * 2, **common)(x)
        x = CaSb(w * 4, **common)(x)
        x = CaSb(w * 8, **common)(x)
        x = SpectralConv(
            1,
            self.final_kernel,
            kernel_init_nonlinearity=self.init_nonlinearity,
            dtype=self.dtype,
        )(x, update_stats=update_stats)
        return x.reshape(x.shape[0])  # (B,1,1,1) -> (B,)


class AutoencoderNet(nn.Module):
    """Encoder -> Decoder (reference Autoencoder forward, Networks.py:302-305)."""

    base_width: int = 64
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = Encoder(self.base_width, self.use_pallas, self.dtype)
        self.decoder = Decoder(self.base_width, 3, self.use_pallas, self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.encoder(x))


class VariationalAutoencoderNet(nn.Module):
    """Encoder -> VarEncBlock -> VarDecBlock -> Decoder; returns (Gx, mu, logvar).

    Ref: Networks.py:855-890. Requires an rngs={'reparam': key} at apply time.
    """

    latent_dim: int = 64
    base_width: int = 64
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = Encoder(self.base_width, self.use_pallas, self.dtype)
        self.variational_encoder_block = VariationalEncoderBlock(
            self.latent_dim, self.dtype
        )
        self.variational_decoder_block = VariationalDecoderBlock(
            self.base_width * 16, self.dtype
        )
        self.decoder = Decoder(self.base_width, 3, self.use_pallas, self.dtype)

    def __call__(self, x: jnp.ndarray):
        encoded = self.encoder(x)
        z, mu, logvar = self.variational_encoder_block(encoded)
        decoded_latent = self.variational_decoder_block(z)
        Gx = self.decoder(decoded_latent)
        return Gx, mu, logvar


def _smoke():  # pragma: no cover - manual shape check, reference parity
    """Shape smoke test over the module zoo, mirroring the reference's
    `python Networks.py` block (Networks.py:2153-2267) — except this one
    runs to completion. Usage: python -m vae_cyclegan_tpu.models.networks
    [image_size] (default 64 to keep compiles fast)."""
    import sys

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    w = 64 if s >= 256 else 16
    b = 2
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, s, s, 3))

    enc = Encoder(base_width=w)
    z = enc.apply(enc.init(key, x), x)
    print(f"Encoder:       {x.shape} -> {z.shape} "
          f"(expect (B,{s//16},{s//16},{w*16}))")

    dec = Decoder(base_width=w)
    out = dec.apply(dec.init(key, z), z)
    print(f"Decoder:       {z.shape} -> {out.shape} (expect {x.shape})")

    veb = VariationalEncoderBlock(latent_dim=64)
    vvars = veb.init({"params": key, "reparam": key}, z)
    zz, mu, lv = veb.apply(vvars, z, rngs={"reparam": key})
    print(f"VarEncBlock:   {z.shape} -> z/mu/logvar {zz.shape}")

    vdb = VariationalDecoderBlock(out_channels=w * 16)
    print(f"VarDecBlock:   {zz.shape} -> {vdb.apply(vdb.init(key, zz), zz).shape}")

    disc = Discriminator(final_kernel=s // 16, base_width=w)
    d = disc.apply(disc.init(key, x), x)
    print(f"Discriminator: {x.shape} -> {d.shape} (expect ({b},))")

    vae = VariationalAutoencoderNet(latent_dim=64, base_width=w)
    gx, mu, lv = vae.apply(
        vae.init({"params": key, "reparam": key}, x), x, rngs={"reparam": key}
    )
    print(f"VAE:           {x.shape} -> Gx {gx.shape}, mu {mu.shape}")
    print("all shapes OK")


if __name__ == "__main__":  # pragma: no cover
    _smoke()
