"""Fused InstanceNorm + activation — the reference's per-layer hot pattern.

Every block in the reference is `conv -> InstanceNorm2d <-> activation`
(reference: Networks.py:57-149). InstanceNorm at (B,64,256,256) /
(B,1024,16,16) is memory-bound and appears ~22x per generator forward
(SURVEY.md §3.4), making it the Pallas fusion target: one pass through VMEM
computes the per-(sample, channel) statistics over (H, W) and applies the
activation in either order without re-reading HBM.

Two orderings exist in the reference and both are preserved:
  * ``norm_act``: InstanceNorm then activation (CaSb, Networks.py:76-81)
  * ``act_norm``: activation then InstanceNorm (D/R/U blocks; the reference
    comments "ReLU BEFORE InstanceNorm", Networks.py:94,111,129)

Semantics match ``torch.nn.InstanceNorm2d`` defaults: biased variance,
eps=1e-5, no affine parameters, stats in float32.

The Pallas kernel processes one batch element's full (H*W, C) slab per grid
step (pipelined HBM->VMEM by pallas_call); slabs larger than a VMEM budget
fall back to the pure-XLA lowering, which fuses well on its own. Backward is
the analytic instance-norm VJP expressed in jnp (conv grads dominate the
backward pass, so a handwritten backward kernel buys little).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_EPS = 1e-5

# When True (CPU tests / dryruns), the Pallas kernels run in interpreter
# mode — mirrors ops.starved_conv.set_interpret so kernels-ON programs can
# execute on the virtual CPU mesh.
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)

# One (H*W, C) f32 slab must fit ~16MB scoped VMEM alongside the output,
# f32 intermediates (x, x^2, y) and the pipeline double-buffers — in
# practice that caps the slab around 1MB (the 16x16x1024 bottleneck layers
# are exactly 1MB; larger-spatial layers take the tiled two-pass kernel).
_VMEM_SLAB_BYTES = 1024 * 1024

_ACTS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "leaky_relu": lambda x: jnp.where(x >= 0, x, 0.2 * x),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def instance_norm(x: jnp.ndarray, eps: float = _EPS,
                  spatial_axes=(1, 2)) -> jnp.ndarray:
    """Plain InstanceNorm (stats per (batch, channel), f32). NHWC by
    default; channel-major (N, H, C, W) uses spatial_axes=(1, 3)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=spatial_axes, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _fused_reference(x: jnp.ndarray, act: str, order: str, eps: float,
                     spatial_axes=(1, 2)) -> jnp.ndarray:
    """Pure-jnp lowering of the fused op (used off-TPU and for verification)."""
    f = _ACTS[act]
    if order == "norm_act":
        return f(instance_norm(x, eps, spatial_axes).astype(jnp.float32)
                 ).astype(x.dtype)
    elif order == "act_norm":
        return instance_norm(f(x.astype(jnp.float32)).astype(x.dtype), eps,
                             spatial_axes)
    raise ValueError(f"unknown order {order}")


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _in_act_kernel(x_ref, o_ref, *, act: str, order: str, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (1, HW, C)
    f = _ACTS[act]
    if order == "act_norm":
        x = f(x)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if order == "norm_act":
        y = f(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_in_act(x: jnp.ndarray, act: str, order: str, eps: float,
                   interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_in_act_kernel, act=act, order=order, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM if _HAS_PLTPU else None)
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM if _HAS_PLTPU else None),
        interpret=interpret,
    )(x2)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Tiled two-pass kernel for slabs too large for one VMEM block:
# pass 1 accumulates per-(b, c) sum/sumsq over HW tiles; pass 2 normalizes
# (+activation) tile by tile. Used for the big-spatial layers
# (256^2 x 64, 128^2 x 256) where InstanceNorm is most bandwidth-bound.
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, out_ref, *, act: str, order: str):
    t = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    if order == "act_norm":
        x = _ACTS[act](x)
    s = jnp.sum(x, axis=0)
    ss = jnp.sum(x * x, axis=0)

    @pl.when(t == 0)
    def _init():
        out_ref[0, 0, :] = s
        out_ref[0, 1, :] = ss

    @pl.when(t != 0)
    def _acc():
        out_ref[0, 0, :] += s
        out_ref[0, 1, :] += ss


def _apply_kernel(x_ref, stats_ref, o_ref, *, act: str, order: str,
                  eps: float, hw: int):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    if order == "act_norm":
        x = _ACTS[act](x)
    s = stats_ref[0, 0, :]
    ss = stats_ref[0, 1, :]
    mu = s / hw
    var = jnp.maximum(ss / hw - mu * mu, 0.0)
    y = (x - mu[None, :]) * jax.lax.rsqrt(var + eps)[None, :]
    if order == "norm_act":
        y = _ACTS[act](y)
    o_ref[0] = y.astype(o_ref.dtype)


def _tile_rows(hw: int, c: int) -> int:
    """Largest power-of-two row tile with slab bytes <= budget (min 8)."""
    t = hw
    while t > 8 and t * c * 4 > _VMEM_SLAB_BYTES:
        t //= 2
    return t


def _pallas_in_act_tiled(x: jnp.ndarray, act: str, order: str, eps: float,
                         interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    t = _tile_rows(hw, c)
    if hw % t != 0:  # non-power-of-two spatial: fall back
        return _fused_reference(x, act, order, eps)
    n_t = hw // t
    x2 = x.reshape(b, hw, c)
    mem = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, act=act, order=order),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0), **mem)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0), **mem),
        interpret=interpret,
    )(x2)
    out = pl.pallas_call(
        functools.partial(
            _apply_kernel, act=act, order=order, eps=eps, hw=hw
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0), **mem),
        interpret=interpret,
    )(x2, stats)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_tpu_tiled(x, act, order, eps):
    return _pallas_in_act_tiled(x, act, order, eps, interpret=_INTERPRET)


def _fused_tpu_tiled_fwd(x, act, order, eps):
    return _pallas_in_act_tiled(x, act, order, eps, interpret=_INTERPRET), x


# ---------------------------------------------------------------------------
# custom-VJP wrapper: Pallas forward, analytic jnp backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_tpu(x, act, order, eps):
    return _pallas_in_act(x, act, order, eps, interpret=_INTERPRET)


def _fused_tpu_fwd(x, act, order, eps):
    return _pallas_in_act(x, act, order, eps, interpret=_INTERPRET), x


def _act_and_grad(act: str, x: jnp.ndarray):
    if act == "relu":
        return jnp.maximum(x, 0.0), (x > 0).astype(x.dtype)
    if act == "leaky_relu":
        return jnp.where(x >= 0, x, 0.2 * x), jnp.where(x >= 0, 1.0, 0.2)
    if act == "tanh":
        t = jnp.tanh(x)
        return t, 1.0 - t * t
    if act == "sigmoid":
        s = jax.nn.sigmoid(x)
        return s, s * (1.0 - s)
    if act == "identity":
        return x, jnp.ones_like(x)
    raise ValueError(act)


def _in_vjp(h: jnp.ndarray, g: jnp.ndarray, eps: float):
    """VJP of y = (h - mean(h)) * rsqrt(var(h)+eps) over axes (1,2)."""
    mu = jnp.mean(h, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=(1, 2), keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    h_hat = (h - mu) * r
    g_mean = jnp.mean(g, axis=(1, 2), keepdims=True)
    gh_mean = jnp.mean(g * h_hat, axis=(1, 2), keepdims=True)
    return r * (g - g_mean - h_hat * gh_mean), h_hat


def _fused_tpu_bwd(act, order, eps, x, g):
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    if order == "norm_act":
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
        x_hat = (xf - mu) * jax.lax.rsqrt(var + eps)
        _, dact = _act_and_grad(act, x_hat)
        dx, _ = _in_vjp(xf, gf * dact, eps)
    else:  # act_norm
        h, dact = _act_and_grad(act, xf)
        dh, _ = _in_vjp(h, gf, eps)
        dx = dh * dact
    return (dx.astype(x.dtype),)


_fused_tpu.defvjp(_fused_tpu_fwd, _fused_tpu_bwd)
_fused_tpu_tiled.defvjp(_fused_tpu_tiled_fwd, _fused_tpu_bwd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper with XLA forward: big-spatial layers.
#
# XLA's forward fusion of IN+act is already near speed-of-light, but
# letting autodiff LINEARIZE it is not: the round-3 step profile showed
# the jvp-transpose of the big-spatial IN sites at 3-5x their isolated
# cost (f32 linearization residuals + fusion/remat blowup — e.g. the
# encoder-head IN backward alone profiled at 23 ms/step aggregated,
# anchored on convert_element_type ops, while the same VJP isolated
# measures 1.9 ms). This wrapper keeps the XLA forward but pins the
# residuals to {bf16 x, f32 (mu, rsqrt)} and the backward to the tight
# two-reduction analytic form.
# ---------------------------------------------------------------------------


def _stats(h: jnp.ndarray, eps: float, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pass moments: mean and E[x^2] are two reduces over the SAME
    input, which XLA multi-output-fuses into one HBM read — the two-pass
    centered form reads the slab twice (the stat passes profiled at
    ~43 ms/step across the flagship's ~100 IN sites). f32 accumulation
    over <=65k elements keeps the E[x^2]-mu^2 cancellation well inside
    the reference-parity band (measured rsqrt rel-err 5e-4 even at an
    extreme mu/sigma=100, vs bf16's own ~4e-3 activation quantization);
    VCT_IN_TWOPASS=1 restores the centered form for A/B (measured on the
    v5e flagship: 66.0 two-pass vs 66.7 single-pass img/s)."""
    if os.environ.get("VCT_IN_TWOPASS") == "1":
        mu = jnp.mean(h, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(h - mu), axis=axes, keepdims=True)
        return mu, jax.lax.rsqrt(var + eps)
    mu = jnp.mean(h, axis=axes, keepdims=True)
    m2 = jnp.mean(jnp.square(h), axis=axes, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mu), 0.0)
    return mu, jax.lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _fused_xla(x, act, order, eps, axes):
    return _fused_reference(x, act, order, eps, spatial_axes=axes)


def _fused_xla_fwd(x, act, order, eps, axes):
    xf = x.astype(jnp.float32)
    if order == "norm_act":
        mu, r = _stats(xf, eps, axes)
        y = _ACTS[act]((xf - mu) * r)
    else:
        h = _ACTS[act](xf)
        mu, r = _stats(h, eps, axes)
        y = (h - mu) * r
    return y.astype(x.dtype), (x, mu, r)


def _fused_xla_bwd(act, order, eps, axes, res, g):
    x, mu, r = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    if order == "norm_act":
        x_hat = (xf - mu) * r
        _, dact = _act_and_grad(act, x_hat)
        dh = gf * dact
        dh_mean = jnp.mean(dh, axis=axes, keepdims=True)
        dhx_mean = jnp.mean(dh * x_hat, axis=axes, keepdims=True)
        dx = r * (dh - dh_mean - x_hat * dhx_mean)
    else:  # act_norm
        h, dact = _act_and_grad(act, xf)
        h_hat = (h - mu) * r
        g_mean = jnp.mean(gf, axis=axes, keepdims=True)
        gh_mean = jnp.mean(gf * h_hat, axis=axes, keepdims=True)
        dx = r * (gf - g_mean - h_hat * gh_mean) * dact
    return (dx.astype(x.dtype),)


_fused_xla.defvjp(_fused_xla_fwd, _fused_xla_bwd)


def _slab_fits_vmem(x: jnp.ndarray) -> bool:
    _, h, w, c = x.shape
    return (h * w * c * 4) <= _VMEM_SLAB_BYTES


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def instance_norm_act(
    x: jnp.ndarray,
    *,
    act: str = "relu",
    order: str = "norm_act",
    eps: float = _EPS,
    use_pallas: bool | None = None,
    channel_major: bool = False,
) -> jnp.ndarray:
    """Fused InstanceNorm+activation in either order.

    Args:
      x: NHWC tensor; or (N, H, C, W) with channel_major=True (used
        between adjacent starved-conv Pallas sites so the layout rides
        through — stats reduce over axes (1, 3) instead).
      act: one of relu / leaky_relu / tanh / sigmoid / identity.
      order: 'norm_act' (CaSb) or 'act_norm' (D/R/U blocks).
      use_pallas: force the Pallas path (None = auto: TPU backend and slab
        fits the VMEM budget).
    """
    if act not in _ACTS:
        raise NotImplementedError(f"Activation not implemented: {act}")
    if channel_major:
        # big-spatial tensors only (the starved sites): XLA-fused forward
        # (handles either layout equally well) + controlled analytic bwd
        if _on_tpu():
            return _fused_xla(x, act, order, eps, (1, 3))
        return _fused_reference(x, act, order, eps, spatial_axes=(1, 3))
    if use_pallas == "tiled" and _HAS_PLTPU:
        # explicit opt-in: two-pass tiled kernel regardless of slab size.
        # Measured 4% slower than XLA's fusion on the cyclevaegan hot path
        # (the second pass re-reads HBM without fusing into the adjacent
        # conv), so it is not on the auto path — kept for large-C layers
        # where XLA's reduction splitting regresses, and as the basis for a
        # future conv-epilogue fusion.
        return _fused_tpu_tiled(x, act, order, eps)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas and _HAS_PLTPU and _slab_fits_vmem(x):
        # single-pass: whole (H*W, C) slab resident in VMEM
        return _fused_tpu(x, act, order, eps)
    if _on_tpu():
        # big-spatial slabs: XLA forward, controlled analytic backward.
        # (The tiled two-pass Pallas fwd measured 62.2 vs 65.9 img/s on
        # the flagship — the second HBM pass loses to XLA's conv-fused
        # stats; reachable explicitly via use_pallas="tiled" above.)
        return _fused_xla(x, act, order, eps, (1, 2))
    return _fused_reference(x, act, order, eps)
