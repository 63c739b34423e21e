"""Atomic network blocks (reference: Networks.py §1, lines 55-149).

All blocks are NHWC Flax modules: reflect-pad -> XLA conv (MXU) ->
fused InstanceNorm+activation (Pallas on TPU). The two norm/activation
orderings of the reference are preserved per block:

  * CaSb: conv -> [InstanceNorm] -> activation      (Networks.py:57-81)
  * D:    pixel_unshuffle -> conv -> ReLU -> IN     (Networks.py:83-96)
  * R:    conv -> ReLU -> IN -> conv -> IN -> +res  (Networks.py:98-116)
  * U:    pixel_shuffle -> conv -> ReLU -> IN       (Networks.py:118-131)
  * S/L:  bare 3x3 reflect-pad convs                (Networks.py:133-149)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_cyclegan_tpu.ops import (
    instance_norm,
    instance_norm_act,
    kaiming_normal_fan_out,
    pixel_shuffle,
    pixel_unshuffle,
    reflect_pad,
)

Dtype = Any

_TORCH_ACT_NAMES = {
    "ReLU": "relu",
    "LeakyReLU": "leaky_relu",
    "Tanh": "tanh",
    "Sigmoid": "sigmoid",
    "Identity": "identity",
}


def _act_name(activation: str) -> str:
    if activation in _TORCH_ACT_NAMES:
        return _TORCH_ACT_NAMES[activation]
    if activation in _TORCH_ACT_NAMES.values():
        return activation
    raise NotImplementedError(f"Activation not implemented: {activation}")


class _ConvParams(nn.Module):
    """Bare conv parameters, named 'Conv_0' by the parent so the param tree
    stays {ReflectConv_i}/{Conv_0}/{kernel,bias} — checkpoint- and
    torch-import-compatible with the nn.Conv layout."""

    features: int
    kernel_size: int
    use_bias: bool
    kernel_init_nonlinearity: str

    @nn.compact
    def __call__(self, cin: int):
        kshape = (self.kernel_size, self.kernel_size, cin, self.features)
        kernel = self.param(
            "kernel", kaiming_normal_fan_out(self.kernel_init_nonlinearity), kshape
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class ReflectConv(nn.Module):
    """Reflect-padded conv, the only conv primitive the reference uses.

    Stride-1 convs with padding == k//2 (every generator conv) dispatch
    the MXU-starved shapes to the fused Pallas kernels in
    `ops.starved_conv` (reflect borders indexed in-kernel for free);
    everything else — including the discriminator's k4/s2 convs — runs
    the materialized reflect pad + XLA conv (`ops.reflect_conv`).

    cm_in/cm_out: the tensor on that side is channel-major (N, H, C, W)
    instead of NHWC. Adjacent MXU-starved Pallas sites (U4 -> IN -> tail)
    hand tensors over in the kernels' native layout, eliding two
    200 MB-class boundary transposes per generator pass; when the Pallas
    path does not engage, explicit transposes preserve the contract.

    resample: 'down2' / 'up2' absorb the D/U blocks' PixelUnshuffle /
    PixelShuffle into the conv itself (`ops.block_conv` equivalences —
    no shuffle copies); the caller passes the PRE-shuffle tensor and the
    stored weight layout is unchanged. Falls back to the literal
    shuffle+conv lowering when the form is gated off or the shape is too
    small for the mirror borders.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init_nonlinearity: str = "relu"
    dtype: Optional[Dtype] = None
    cm_in: bool = False
    cm_out: bool = False
    resample: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from vae_cyclegan_tpu.ops import block_conv
        from vae_cyclegan_tpu.ops.starved_conv import (
            _starved_conv_cm,
            _to_cm,
            _to_nhwc,
            cm_engaged,
            starved_reflect_conv,
        )

        if self.cm_in:
            n, h, c, wd = x.shape
            nhwc_shape = (n, h, wd, c)
        else:
            nhwc_shape = x.shape
        cin = nhwc_shape[-1]
        if self.resample == "down2":
            cin = 4 * cin
        elif self.resample == "up2":
            cin = cin // 4
        kernel, bias = _ConvParams(
            self.features,
            self.kernel_size,
            self.use_bias,
            self.kernel_init_nonlinearity,
            name="Conv_0",
        )(cin)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        kc = kernel.astype(dtype)
        cm_x = self.cm_in
        if self.resample == "down2":
            if cm_x:  # no cm-in down2 path: the head->down2 cm handover
                # measured a wash on v5e and was retired (round 5;
                # ops/block_conv.down2_conv docstring)
                xc, cm_x = _to_nhwc(xc), False
            if block_conv.down2_applicable(nhwc_shape):
                y = block_conv.down2_conv(xc, kc)
                if self.cm_out:
                    y = _to_cm(y)
                return _bias(y, bias, self.cm_out)
            xc = pixel_unshuffle(xc, 2)
            nhwc_shape = xc.shape
        elif self.resample == "up2":
            # The phase-conv up2 form (4 dense k2 convs + interleave) was
            # built, exactness-tested, and measured an e2e LOSS at every
            # site split (output interleave = one 6-D transpose per site;
            # autoencoder 240-267 vs 276 img/s, ROADMAP round 3 item 2);
            # retired in round 5 — code in git history (commit b287a35).
            if cm_x:  # no cm-in up2 path; normalize (no production site)
                xc, cm_x = _to_nhwc(xc), False
            xc = pixel_shuffle(xc, 2)
            nhwc_shape = xc.shape
        same = self.stride == 1 and self.padding == self.kernel_size // 2
        if same and cm_engaged(nhwc_shape, kc.shape, dtype):
            xt = xc if cm_x else _to_cm(xc)
            yt = _starved_conv_cm(xt, kc)
            y = yt if self.cm_out else _to_nhwc(yt)
            cm_y = self.cm_out
        else:
            xn = _to_nhwc(xc) if cm_x else xc
            if same:
                y = starved_reflect_conv(xn, kc)
            else:
                xp = reflect_pad(xn, self.padding)
                y = jax.lax.conv_general_dilated(
                    xp, kc, (self.stride, self.stride), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            if self.cm_out:
                y = _to_cm(y)
            cm_y = self.cm_out
        return _bias(y, bias, cm_y)


def _bias(y, bias, cm):
    if bias is None:
        return y
    b = bias.astype(y.dtype)
    return y + (b[:, None] if cm else b)


class CaSb(nn.Module):
    """Conv -> optional InstanceNorm -> activation (Networks.py:57-81)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 3
    activation: str = "ReLU"
    use_norm: bool = True
    kernel_init_nonlinearity: str = "relu"
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None
    cm_in: bool = False  # input arrives channel-major (N, H, C, W)
    # cm_out: emit channel-major — set by Decoder on U4 when the tail
    # conv consumes cm (U4 -> IN -> tail handover)
    cm_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _act_name(self.activation)
        x = ReflectConv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            kernel_init_nonlinearity=self.kernel_init_nonlinearity,
            dtype=self.dtype,
            cm_in=self.cm_in,
            cm_out=self.cm_out,
        )(x)
        if self.use_norm:
            return instance_norm_act(
                x, act=act, order="norm_act", use_pallas=self.use_pallas,
                channel_major=self.cm_out,
            )
        if act == "identity":
            return x
        return _apply_act(x, act)


def _apply_act(x: jnp.ndarray, act: str) -> jnp.ndarray:
    from vae_cyclegan_tpu.ops.instance_norm import _ACTS

    return _ACTS[act](x.astype(jnp.float32)).astype(x.dtype)


class DBlock(nn.Module):
    """PixelUnshuffle(2) -> conv3x3(in*4 -> out) -> ReLU -> IN (Networks.py:83-96).

    cm_in: input is channel-major (N, H, C, W) — set by Encoder on D1
    when the head conv took the Pallas path, so the head's output rides
    its kernel-native layout into the down2 conv with no transpose.
    """

    features: int
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None
    cm_in: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype,
                        resample="down2", cm_in=self.cm_in)(x)
        return instance_norm_act(x, act="relu", order="act_norm", use_pallas=self.use_pallas)


class RBlock(nn.Module):
    """conv -> ReLU -> IN -> conv -> IN -> + residual (Networks.py:98-116).

    No activation after the residual add.
    """

    features: int
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        h = instance_norm_act(h, act="relu", order="act_norm", use_pallas=self.use_pallas)
        h = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(h)
        h = instance_norm_act(h, act="identity", order="act_norm", use_pallas=self.use_pallas)
        return h + residual


class UBlock(nn.Module):
    """PixelShuffle(2) -> conv3x3(in/4 -> out) -> ReLU -> IN (Networks.py:118-131).

    cm_out: emit channel-major (N, H, C, W) — set by Decoder on U4 when
    the following tail conv also takes the Pallas path, so the IN+act
    between them runs on the kernels' native layout with no transposes.
    """

    features: int
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None
    cm_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype,
                        cm_out=self.cm_out, resample="up2")(x)
        return instance_norm_act(x, act="relu", order="act_norm",
                                 use_pallas=self.use_pallas,
                                 channel_major=self.cm_out)


class SConv(nn.Module):
    """Bare 3x3 reflect-pad conv (Networks.py:133-140)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(x)


class LConv(nn.Module):
    """Bare 3x3 reflect-pad conv, identical to SConv (Networks.py:142-149)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(x)
