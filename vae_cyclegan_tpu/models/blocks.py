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


class ReflectConv(nn.Module):
    """Reflect-padded conv, the only conv primitive the reference uses."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init_nonlinearity: str = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = reflect_pad(x, self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=kaiming_normal_fan_out(self.kernel_init_nonlinearity),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


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
        )(x)
        if self.use_norm:
            return instance_norm_act(
                x, act=act, order="norm_act", use_pallas=self.use_pallas
            )
        if act == "identity":
            return x
        return _apply_act(x, act)


def _apply_act(x: jnp.ndarray, act: str) -> jnp.ndarray:
    from vae_cyclegan_tpu.ops.instance_norm import _ACTS

    return _ACTS[act](x.astype(jnp.float32)).astype(x.dtype)


class DBlock(nn.Module):
    """PixelUnshuffle(2) -> conv3x3(in*4 -> out) -> ReLU -> IN (Networks.py:83-96)."""

    features: int
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = pixel_unshuffle(x, 2)
        x = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(x)
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
    """PixelShuffle(2) -> conv3x3(in/4 -> out) -> ReLU -> IN (Networks.py:118-131)."""

    features: int
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = pixel_shuffle(x, 2)
        x = ReflectConv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        return instance_norm_act(x, act="relu", order="act_norm", use_pallas=self.use_pallas)


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
