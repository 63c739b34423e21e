"""Checkpoint save/resume round-trip + weight transfer surgery
(SURVEY.md §4 test plan item e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_cyclegan_tpu.config import ModelConfig
from vae_cyclegan_tpu.models.tasks import create_task
from vae_cyclegan_tpu.utils import (
    checkpoint_exists,
    load_checkpoint,
    load_pretrained_doubleae_to_cycle,
    load_pretrained_doublevae_to_cycle,
    save_checkpoint,
)

MC = ModelConfig(image_size=32, latent_dim=8, base_width=8, use_pallas=False)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_checkpoint_roundtrip(tmp_path):
    task = create_task("vae", model=MC)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = {
        "x": jnp.ones((2, 32, 32, 3)) * 0.5,
        "y": jnp.ones((2, 32, 32, 3)) * 0.5,
    }
    state, _ = jax.jit(task.train_step)(state, batch)

    path = tmp_path / "checkpoint_epoch_1"
    save_checkpoint(state, epoch=0, loss=1.25, args={"architecture": "vae"},
                    path=path)
    assert checkpoint_exists(path)

    template = task.init_state(jax.random.PRNGKey(1))
    restored, epoch, loss, args = load_checkpoint(template, path)
    assert epoch == 0 and loss == pytest.approx(1.25)
    assert args["architecture"] == "vae"
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == 1

    # training continues identically from the restored state
    s_a, m_a = jax.jit(task.train_step)(state, batch)
    s_b, m_b = jax.jit(task.train_step)(restored, batch)
    assert float(m_a["G_loss"]) == pytest.approx(float(m_b["G_loss"]), rel=1e-6)


def test_checkpoint_missing_path(tmp_path):
    task = create_task("autoencoder", model=MC)
    template = task.init_state(jax.random.PRNGKey(0))
    with pytest.raises(FileNotFoundError):
        load_checkpoint(template, tmp_path / "nope")


def test_gan_checkpoint_keeps_spectral_state(tmp_path):
    task = create_task("aegan", model=MC)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = {
        "x": jnp.ones((2, 32, 32, 3)) * 0.3,
        "y": jnp.ones((2, 32, 32, 3)) * 0.7,
    }
    state, _ = jax.jit(task.train_step)(state, batch)
    path = tmp_path / "best_model"
    save_checkpoint(state, 0, 0.5, {}, path)
    template = task.init_state(jax.random.PRNGKey(9))
    restored, *_ = load_checkpoint(template, path)
    assert _tree_equal(restored.spectral, state.spectral)


def test_doubleae_transfer():
    """DoubleAE {encoder, decoder_A/B} -> CycleAE G/F (utils.py:57-121)."""
    double = create_task("doubleae", model=MC)
    dstate = double.init_state(jax.random.PRNGKey(0))
    src = dstate.params["model"]

    cycle = create_task("cycleae", model=MC)
    cstate = cycle.init_state(jax.random.PRNGKey(1))
    out = load_pretrained_doubleae_to_cycle(cstate, src)

    assert _tree_equal(out.params["G"]["encoder"], src["encoder"])
    assert _tree_equal(out.params["G"]["decoder"], src["decoder_B"])
    assert _tree_equal(out.params["F"]["encoder"], src["encoder"])
    assert _tree_equal(out.params["F"]["decoder"], src["decoder_A"])
    # decoders differ, so G and F can't both equal the same tree
    assert not _tree_equal(out.params["G"]["decoder"], out.params["F"]["decoder"])


def test_doublevae_transfer_into_cyclevaegan():
    double = create_task("doublevae", model=MC)
    dstate = double.init_state(jax.random.PRNGKey(0))
    src = dstate.params["model"]

    cyc = create_task("cyclevaegan", model=MC)
    cstate = cyc.init_state(jax.random.PRNGKey(1))
    out = load_pretrained_doublevae_to_cycle(cstate, src)
    assert _tree_equal(out.params["G"]["variational_encoder_block"],
                       src["vae_encoder_block_B"])
    assert _tree_equal(out.params["F"]["variational_encoder_block"],
                       src["vae_encoder_block_A"])
    assert _tree_equal(out.params["G"]["decoder"], src["decoder_B"])
    # discriminators untouched
    assert _tree_equal(out.params["DX"], cstate.params["DX"])

    # transferred model still trains
    batch = {
        "x": jnp.ones((2, 32, 32, 3)) * 0.4,
        "y": jnp.ones((2, 32, 32, 3)) * 0.6,
    }
    _, metrics = jax.jit(cyc.train_step)(out, batch)
    assert np.isfinite(float(metrics["G_loss"]))


def test_transfer_missing_subtree_raises():
    double = create_task("doubleae", model=MC)
    dstate = double.init_state(jax.random.PRNGKey(0))
    cycle = create_task("cyclevae", model=MC)
    cstate = cycle.init_state(jax.random.PRNGKey(1))
    with pytest.raises(KeyError):
        load_pretrained_doublevae_to_cycle(cstate, dstate.params["model"])
