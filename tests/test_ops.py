"""Unit tests for core ops against torch reference semantics.

torch (CPU) is used as an oracle for InstanceNorm2d, PixelShuffle/Unshuffle
and spectral_norm — verifying formula parity without porting code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_cyclegan_tpu.ops import (
    instance_norm,
    instance_norm_act,
    pixel_shuffle,
    pixel_unshuffle,
    reflect_pad,
    spectral_normalize,
)


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    theirs = _nhwc(torch.nn.InstanceNorm2d(5)(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("order", ["norm_act", "act_norm"])
@pytest.mark.parametrize("act", ["relu", "leaky_relu", "tanh", "identity"])
def test_instance_norm_act_orders_match_torch(rng, order, act):
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    ours = np.asarray(instance_norm_act(jnp.asarray(x), act=act, order=order))

    tnorm = torch.nn.InstanceNorm2d(3)
    tact = {
        "relu": torch.nn.ReLU(),
        "leaky_relu": torch.nn.LeakyReLU(0.2),
        "tanh": torch.nn.Tanh(),
        "identity": torch.nn.Identity(),
    }[act]
    t = _nchw(x)
    if order == "norm_act":
        expected = _nhwc(tact(tnorm(t)))
    else:
        expected = _nhwc(tnorm(tact(t)))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_pallas_kernel_interpret_matches_reference(rng):
    from vae_cyclegan_tpu.ops.instance_norm import _fused_reference, _pallas_in_act

    x = jnp.asarray(rng.randn(2, 4 * 4, 16).astype(np.float32)).reshape(2, 4, 4, 16)
    for order in ["norm_act", "act_norm"]:
        ref = _fused_reference(x, "relu", order, 1e-5)
        got = _pallas_in_act(x, "relu", order, 1e-5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_vjp_matches_autodiff_of_reference(rng):
    from vae_cyclegan_tpu.ops.instance_norm import (
        _fused_reference,
        _fused_tpu_bwd,
    )

    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    for order in ["norm_act", "act_norm"]:
        for act in ["relu", "tanh", "leaky_relu", "sigmoid", "identity"]:
            _, ref_vjp = jax.vjp(
                lambda v: _fused_reference(v, act, order, 1e-5), x
            )
            (want,) = ref_vjp(g)
            (got,) = _fused_tpu_bwd(act, order, 1e-5, x, g)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4,
                err_msg=f"{order}/{act}",
            )


def test_fused_xla_custom_vjp_matches_autodiff(rng):
    """The big-slab XLA-forward custom_vjp (values, grads, both layouts)."""
    from vae_cyclegan_tpu.ops.instance_norm import (
        _fused_reference,
        _fused_xla,
    )

    for axes, shape in [((1, 2), (2, 4, 6, 3)), ((1, 3), (2, 4, 3, 6))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        g = jnp.asarray(rng.randn(*shape).astype(np.float32))
        for order in ["norm_act", "act_norm"]:
            for act in ["relu", "tanh", "identity"]:
                ref = lambda v: _fused_reference(v, act, order, 1e-5, axes)
                got_y = _fused_xla(x, act, order, 1e-5, axes)
                np.testing.assert_allclose(
                    np.asarray(got_y), np.asarray(ref(x)), atol=1e-5,
                    err_msg=f"fwd {order}/{act}/{axes}",
                )
                _, ref_vjp = jax.vjp(ref, x)
                (want,) = ref_vjp(g)
                _, vjp = jax.vjp(
                    lambda v: _fused_xla(v, act, order, 1e-5, axes), x
                )
                (got,) = vjp(g)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=1e-4,
                    err_msg=f"bwd {order}/{act}/{axes}",
                )


def test_pixel_unshuffle_matches_torch(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    theirs = _nhwc(torch.nn.PixelUnshuffle(2)(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.randn(2, 4, 4, 12).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = _nhwc(torch.nn.PixelShuffle(2)(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pixel_shuffle(pixel_unshuffle(x))), np.asarray(x)
    )


def test_pixel_shuffle_custom_vjp_is_exact_inverse(rng):
    """The dtype-pinned adjoints are exactly the opposite shuffle of the
    cotangent (shuffles are permutations), in the cotangent's own dtype."""
    for fwd, inv, shape in [
        (pixel_shuffle, pixel_unshuffle, (2, 4, 4, 12)),
        (pixel_unshuffle, pixel_shuffle, (2, 8, 8, 3)),
    ]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        y, vjp = jax.vjp(lambda v: fwd(v, 2), x)
        g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
        (dx,) = vjp(g)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(inv(g, 2)),
                                   atol=0)
        _, vjp16 = jax.vjp(lambda v: fwd(v, 2), x.astype(jnp.bfloat16))
        (dx16,) = vjp16(g.astype(jnp.bfloat16))
        assert dx16.dtype == jnp.bfloat16


def test_reflect_pad_matches_torch(rng):
    x = rng.randn(1, 5, 5, 2).astype(np.float32)
    ours = np.asarray(reflect_pad(jnp.asarray(x), 2))
    theirs = _nhwc(torch.nn.ReflectionPad2d(2)(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_spectral_normalize_matches_torch(rng):
    """One power iteration + sigma must match torch.nn.utils.spectral_norm."""
    kh = kw = 3
    cin, cout = 4, 2
    w_t = torch.randn(cout, cin, kh, kw)
    conv = torch.nn.Conv2d(cin, cout, kh, bias=False)
    with torch.no_grad():
        conv.weight.copy_(w_t)
    sn = torch.nn.utils.spectral_norm(conv)
    u0 = sn.weight_u.detach().numpy().copy()
    v0 = sn.weight_v.detach().numpy().copy()

    # torch flattens (cout, cin*kh*kw); ours flattens (kh*kw*cin, cout)^T.
    # Use the SAME matrix in both by building our kernel so that the
    # flattened columns correspond (permutation changes u/v entries but we
    # feed identical starting vectors in each library's own layout).
    x_t = torch.randn(1, cin, 8, 8)
    sn.train()
    _ = sn(x_t)  # one power iteration + normalized weight used
    w_used_torch = (sn.weight_orig / (
        torch.dot(sn.weight_u, sn.weight_orig.reshape(cout, -1) @ sn.weight_v)
    )).detach().numpy()

    # ours: kernel (kh,kw,cin,cout); construct the matching matrix
    w_ours = np.transpose(w_t.numpy(), (2, 3, 1, 0))  # kh,kw,cin,cout
    # map torch's v (over cin*kh*kw, row-major (cin,kh,kw)) into our flat
    # order (kh,kw,cin):
    v0_ours = np.transpose(v0.reshape(cin, kh, kw), (1, 2, 0)).reshape(-1)
    w_sn, u1, v1 = spectral_normalize(
        jnp.asarray(w_ours), jnp.asarray(u0), jnp.asarray(v0_ours), update=True
    )
    got = np.transpose(np.asarray(w_sn), (3, 2, 0, 1))  # back to torch layout
    np.testing.assert_allclose(got, w_used_torch, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(u1), sn.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_tiled_pallas_kernel_matches_reference(rng, monkeypatch):
    """Two-pass tiled kernel (big-spatial layers) vs the jnp lowering."""
    import importlib

    inmod = importlib.import_module("vae_cyclegan_tpu.ops.instance_norm")
    _fused_reference = inmod._fused_reference
    _pallas_in_act_tiled = inmod._pallas_in_act_tiled

    monkeypatch.setattr(inmod, "_VMEM_SLAB_BYTES", 64 * 1024)  # force tiles
    x = jnp.asarray(rng.randn(2, 32, 32, 64).astype(np.float32))
    for order in ["norm_act", "act_norm"]:
        for act in ["relu", "identity"]:
            ref = _fused_reference(x, act, order, 1e-5)
            got = _pallas_in_act_tiled(x, act, order, 1e-5, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-4,
                err_msg=f"{order}/{act}",
            )


def test_tiled_kernel_vjp_matches_reference(rng, monkeypatch):
    import importlib

    inmod = importlib.import_module("vae_cyclegan_tpu.ops.instance_norm")
    monkeypatch.setattr(inmod, "_VMEM_SLAB_BYTES", 64 * 1024)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    _, ref_vjp = jax.vjp(
        lambda v: inmod._fused_reference(v, "relu", "act_norm", 1e-5), x
    )
    (want,) = ref_vjp(g)
    (got,) = inmod._fused_tpu_bwd("relu", "act_norm", 1e-5, x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_in_twopass_moments_match_single_pass(rng, monkeypatch):
    """VCT_IN_TWOPASS=1 (centered two-pass moments, the measured-slower
    A/B form) must agree with the default single-pass E[x^2]-mu^2 form —
    the only behavioral difference is HBM traffic, never values."""
    import importlib

    inmod = importlib.import_module("vae_cyclegan_tpu.ops.instance_norm")
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32) * 3 + 1.5)
    base = inmod._stats(x, 1e-5, (1, 2))
    monkeypatch.setenv("VCT_IN_TWOPASS", "1")
    two = inmod._stats(x, 1e-5, (1, 2))
    for a, b in zip(base, two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k", [3, 7])
def test_reflect_conv_exact(rng, k):
    """reflect_conv == pad-then-conv, values and gradients."""
    from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv

    x = jnp.asarray(rng.randn(2, 12, 10, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 4, 5).astype(np.float32)) * 0.1

    def naive(x_, w_):
        xp = jnp.pad(
            x_, ((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)),
            mode="reflect",
        )
        return jax.lax.conv_general_dilated(
            xp, w_, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    a = naive(x, w)
    b = reflect_conv(x, w)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)

    ga = jax.grad(lambda w_: jnp.sum(naive(x, w_) ** 2))(w)
    gb = jax.grad(lambda w_: jnp.sum(reflect_conv(x, w_) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-4,
                               atol=1e-4)
    gxa = jax.grad(lambda x_: jnp.sum(naive(x_, w) ** 2))(x)
    gxb = jax.grad(lambda x_: jnp.sum(reflect_conv(x_, w) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa), rtol=1e-4,
                               atol=1e-4)


def test_reflect_conv_small_input_fallback(rng):
    from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv

    x = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 2).astype(np.float32))
    out = reflect_conv(x, w)  # falls back to explicit pad
    assert out.shape == (1, 2, 2, 2)
