"""Correctness of the fused Pallas starved-conv kernels (interpret mode).

Oracles: the materialized reflect-pad conv (`_naive_reflect_conv`) and
jax.grad through it — the custom_vjp must match both, including the
reflect-pad adjoint's border folds (reference conv semantics:
Networks.py:57-149 reflect-padded stride-1 convs).
"""
import jax
import jax.numpy as jnp
import pytest

from vae_cyclegan_tpu.ops import starved_conv as sc
from vae_cyclegan_tpu.ops.reflect_conv import _naive_reflect_conv


@pytest.fixture(autouse=True)
def _interpret_mode():
    sc.set_interpret(True)
    yield
    sc.set_interpret(False)


CONV_CASES = [
    (32, 40, 3, 16, 7),   # low-cin (head-like, form A)
    (32, 40, 16, 3, 7),   # low-cout (tail-like, form B)
    (32, 32, 8, 16, 3),   # U4-like
    (32, 32, 16, 8, 3),
    (48, 40, 3, 8, 5),
    (40, 48, 4, 8, 3),    # non-power-of-two rows (partial chunks)
]


@pytest.mark.parametrize("h,w,cin,cout,k", CONV_CASES)
def test_forward_matches_reference(h, w, cin, cout, k):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, h, w, cin), jnp.float32)
    wgt = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.1
    got = sc._starved_conv(x, wgt)
    want = _naive_reflect_conv(x, wgt)
    assert got.shape == want.shape
    assert float(jnp.max(jnp.abs(got - want))) < 5e-5


@pytest.mark.parametrize("h,w,cin,cout,k", CONV_CASES[:4])
def test_gradients_match_reference(h, w, cin, cout, k):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, h, w, cin), jnp.float32)
    wgt = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.PRNGKey(3), (2, h, w, cout),
                            jnp.float32)

    def loss(fn, x_, w_):
        return jnp.sum(fn(x_, w_) * cot)

    gx_r, gw_r = jax.grad(
        lambda a, b: loss(_naive_reflect_conv, a, b), argnums=(0, 1))(x, wgt)
    gx_n, gw_n = jax.grad(
        lambda a, b: loss(sc._starved_conv, a, b), argnums=(0, 1))(x, wgt)
    assert float(jnp.max(jnp.abs(gx_r - gx_n))) < 5e-5
    assert float(jnp.max(jnp.abs(gw_r - gw_n))) < 5e-4


def test_full_correlation_zero_mode():
    """The zero-padded FULL-correlation form the backward uses (out
    spatial = in + k - 1, partial row chunks) must equal XLA's."""
    k = 7
    g = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 40, 8),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (k, k, 4, 8),
                          jnp.float32) * 0.1
    wrot = w[::-1, ::-1].transpose(0, 1, 3, 2)
    got = sc._conv_dispatch(g, wrot, pad_mode="zero")
    gp = jnp.pad(g, ((0, 0), (k - 1, k - 1), (k - 1, k - 1), (0, 0)))
    want = jax.lax.conv_general_dilated(
        gp, wrot, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == want.shape
    assert float(jnp.max(jnp.abs(got - want))) < 5e-5


def test_dispatcher_falls_back_for_unsupported_shapes():
    # stride-irrelevant big-channel conv must use the XLA path
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 64),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 64, 64),
                          jnp.float32) * 0.1
    assert not sc._supported(x.shape, w.shape, x.dtype)
    got = sc.starved_reflect_conv(x, w)
    want = _naive_reflect_conv(x, w)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_dispatcher_uses_kernels_for_starved_shapes():
    assert sc._supported((2, 64, 64, 3), (7, 7, 3, 64), jnp.float32)
    assert sc._supported((2, 64, 64, 64), (7, 7, 64, 3), jnp.bfloat16)
    assert sc._supported((2, 256, 256, 32), (3, 3, 32, 64), jnp.bfloat16)
    # even k / k == 1 / tiny spatial excluded
    assert not sc._supported((2, 64, 64, 3), (4, 4, 3, 64), jnp.float32)
    assert not sc._supported((2, 64, 64, 3), (1, 1, 3, 64), jnp.float32)
    assert not sc._supported((2, 16, 16, 3), (7, 7, 3, 64), jnp.float32)
