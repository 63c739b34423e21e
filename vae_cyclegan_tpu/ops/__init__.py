"""TPU-native compute ops: padding, pixel (un)shuffle, fused instance norm,
spectral normalization, initializers."""

from vae_cyclegan_tpu.ops.padding import reflect_pad
from vae_cyclegan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from vae_cyclegan_tpu.ops.instance_norm import instance_norm, instance_norm_act
from vae_cyclegan_tpu.ops.initializers import kaiming_normal_fan_out
from vae_cyclegan_tpu.ops.spectral_norm import spectral_normalize
from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv
from vae_cyclegan_tpu.ops.starved_conv import starved_reflect_conv
