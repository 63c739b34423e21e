"""ops.block_conv: the shuffle-free down2 conv equivalence.

Oracle = the literal reference lowering (pixel unshuffle + reflect conv),
values AND gradients, including the cm_in layout and the module fallback
on shapes too small for the mirror borders. (The up2 phase-conv form was
retired in round 5 — measured composed loss; see block_conv docstring.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_cyclegan_tpu.ops import pixel_unshuffle
from vae_cyclegan_tpu.ops.block_conv import down2_applicable, down2_conv
from vae_cyclegan_tpu.ops.reflect_conv import _naive_reflect_conv


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("h,w,c,f", [(8, 8, 4, 8), (12, 8, 2, 4), (4, 6, 3, 5)])
def test_down2_matches_unshuffle_conv(rng, h, w, c, f):
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    w3 = jnp.asarray(0.1 * rng.randn(3, 3, 4 * c, f).astype(np.float32))
    g = jnp.asarray(rng.randn(2, h // 2, w // 2, f).astype(np.float32))

    ref = lambda v, k: _naive_reflect_conv(pixel_unshuffle(v, 2), k)
    assert down2_applicable(x.shape)
    got = down2_conv(x, w3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w3)),
                               atol=1e-4)
    want_grads = jax.vjp(ref, x, w3)[1](g)
    got_grads = jax.vjp(down2_conv, x, w3)[1](g)
    for a, b, name in zip(got_grads, want_grads, ["dx", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


def test_blocks_match_legacy_lowering(rng, monkeypatch):
    """DBlock/UBlock with the forms ON == with the forms OFF (legacy
    shuffle+conv), same params, values and grads."""
    from vae_cyclegan_tpu.models.blocks import DBlock, UBlock

    for cls, shape in [(DBlock, (2, 8, 8, 4)), (UBlock, (2, 4, 4, 16))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        mod = cls(features=8, use_pallas=False)
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p, v, on):
            monkeypatch.setenv("VCT_BLOCK_FORMS", "1" if on else "0")
            return jnp.sum(jnp.sin(mod.apply(p, v)))

        y_on, g_on = jax.value_and_grad(loss)(params, x, True)
        y_off, g_off = jax.value_and_grad(loss)(params, x, False)
        np.testing.assert_allclose(float(y_on), float(y_off), rtol=2e-5,
                                   err_msg=cls.__name__)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg=cls.__name__),
            g_on, g_off,
        )


def test_fallback_on_tiny_shapes(rng, monkeypatch):
    """Below the down2 mirror-border floor (or odd fine dims) the module
    silently uses the legacy shuffle lowering."""
    from vae_cyclegan_tpu.models.blocks import UBlock

    monkeypatch.setenv("VCT_BLOCK_FORMS", "1")
    assert not down2_applicable((1, 3, 4, 2))
    x = jnp.asarray(rng.randn(1, 1, 1, 16).astype(np.float32))
    mod = UBlock(features=4, use_pallas=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 2, 2, 4)
