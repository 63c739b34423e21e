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
def _interpret_mode(monkeypatch):
    # FORCE all-pallas dispatch so the per-shape best-of table (which
    # routes e.g. the cin<8 forward to XLA in production) does not hide
    # kernel paths from these correctness tests.
    monkeypatch.setenv("VCT_STARVED_FORCE", "1")
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


@pytest.mark.parametrize("h,w,cin,cout,k", [
    (32, 40, 8, 3, 7),    # tail-like dx: g has cout=3... here g chans=cin
    (40, 32, 16, 8, 3),
    (48, 48, 3, 8, 5),
])
def test_dx_border_fold_matches_oracle(h, w, cin, cout, k):
    """zero_same kernel + strip corrections == fold(full_corr) oracle."""
    p = k // 2
    g = jax.random.normal(jax.random.PRNGKey(7), (2, h, cin, w),
                          jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(8), (k, k, cout, cin),
                            jnp.float32) * 0.1
    wrot = wgt[::-1, ::-1].transpose(0, 1, 3, 2)
    got = sc._dx_with_border_fold(g, wrot, p)
    want = sc._reflect_fold_cm(
        sc._conv_dispatch_cm(g, wrot, pad_mode="zero"), p)
    assert got.shape == want.shape
    assert float(jnp.max(jnp.abs(got - want))) < 5e-5


@pytest.mark.parametrize("knob", ["VCT_TIGHT_CO", "VCT_DW_SWAP"])
def test_packing_knobs_are_pure_layout(monkeypatch, knob):
    """The tight-M channel packing (VCT_TIGHT_CO) and the per-shape dw
    dot orientation (VCT_DW_SWAP) are performance layouts only: knob-off
    must reproduce knob-on forward AND gradients exactly on the
    low-cout shape class both engage on (tail-like k7 cin>=8 -> cout=3)."""
    h, w, cin, cout, k = 32, 40, 16, 3, 7
    x = jax.random.normal(jax.random.PRNGKey(11), (2, h, w, cin),
                          jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(12), (k, k, cin, cout),
                            jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.PRNGKey(13), (2, h, w, cout),
                            jnp.float32)

    def run():
        out = sc._starved_conv(x, wgt)
        gx, gw = jax.grad(
            lambda a, b: jnp.sum(sc._starved_conv(a, b) * cot),
            argnums=(0, 1))(x, wgt)
        return out, gx, gw

    on = run()
    monkeypatch.setenv(knob, "0")
    off = run()
    for a, b in zip(on, off):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-5


def test_cm_chain_matches_nhwc(monkeypatch):
    """U4-style conv -> IN(act_norm) -> tail conv with channel-major
    handover must equal the all-NHWC lowering (fwd and grads)."""
    import numpy as np

    from vae_cyclegan_tpu.ops.instance_norm import instance_norm_act
    from vae_cyclegan_tpu.ops.reflect_conv import reflect_conv

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 32, 32, 4), jnp.float32)
    w1 = jax.random.normal(key, (3, 3, 4, 8), jnp.float32) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(8), (7, 7, 8, 3),
                           jnp.float32) * 0.1

    def chain_cm(x, w1, w2):
        xt = jnp.transpose(x, (0, 1, 3, 2))
        y = sc.starved_reflect_conv_cm(xt, w1)
        y = instance_norm_act(y, act="relu", order="act_norm",
                              channel_major=True)
        z = sc.starved_reflect_conv_cm(y, w2)
        return jnp.transpose(z, (0, 1, 3, 2))

    def chain_ref(x, w1, w2):
        y = reflect_conv(x, w1)
        y = instance_norm_act(y, act="relu", order="act_norm",
                              use_pallas=False)
        return reflect_conv(y, w2)

    got = chain_cm(x, w1, w2)
    want = chain_ref(x, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)

    cot = jax.random.normal(jax.random.PRNGKey(9), got.shape, jnp.float32)
    g_cm = jax.grad(lambda *a: jnp.sum(chain_cm(*a) * cot),
                    argnums=(0, 1, 2))(x, w1, w2)
    g_rf = jax.grad(lambda *a: jnp.sum(chain_ref(*a) * cot),
                    argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g_cm, g_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


def test_decoder_cm_path_matches_xla(monkeypatch):
    """Full Decoder with the Pallas+cm path engaged (interpret mode) must
    match the pure-XLA decoder."""
    import numpy as np

    from vae_cyclegan_tpu.models.networks import Decoder

    dec = Decoder(base_width=8, use_pallas=False)
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 2, 2, 128),
                          jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), z)
    got = dec.apply(params, z)  # interpret fixture: kernels + cm engage
    monkeypatch.setenv("VCT_STARVED_CONV", "0")
    want = dec.apply(params, z)
    assert got.shape == want.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)


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
