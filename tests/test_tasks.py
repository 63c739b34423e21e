"""Per-architecture one-step train integration tests on tiny images:
finite losses, parameter updates, reference-matching metric keys
(SURVEY.md §4 test plan item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_cyclegan_tpu.config import LossConfig, ModelConfig, OptimConfig
from vae_cyclegan_tpu.models.tasks import ARCHITECTURES, create_task

pytestmark = pytest.mark.slow  # train/eval step compiles across all 10 architectures

MC = ModelConfig(image_size=32, latent_dim=8, base_width=8, use_pallas=False)

# Reference metric keys per architecture's training_step (Networks.py).
EXPECTED_TRAIN_KEYS = {
    "autoencoder": {"G_loss", "loss_trans", "total_loss"},
    "doubleae": {"G_loss", "loss_recon_A", "loss_recon_B", "total_loss"},
    "doublevae": {
        "G_loss", "loss_recon_A", "loss_recon_B",
        "loss_kl", "loss_kl_A", "loss_kl_B", "total_loss",
    },
    "vae": {"G_loss", "loss_trans", "loss_kl"},
    "aegan": {
        "G_loss", "D_loss", "D_loss_real", "D_loss_fake",
        "loss_trans", "loss_gan_g", "loss_identity", "d_y_mean", "d_gx_mean",
    },
    "vaegan": {
        "G_loss", "D_loss", "loss_gan_disc_real", "loss_gan_disc_fake",
        "loss_trans", "loss_gan_real", "loss_gan_fake",
        "loss_identity", "loss_kl",
    },
    "cycleae": {"total_loss", "loss_cycle", "G_loss", "loss_trans"},
    "cyclevae": {"total_loss", "loss_cycle", "loss_kl", "G_loss", "loss_trans"},
    "cycleaegan": {
        "total_loss", "G_loss", "D_loss",
        "D_loss_x_real", "D_loss_x_fake", "D_loss_y_real", "D_loss_y_fake",
        "loss_cycle", "loss_gan_g",
        "loss_gan_g_x_real", "loss_gan_g_x_fake",
        "loss_gan_g_y_real", "loss_gan_g_y_fake",
        "d_x_real_mean", "d_x_fake_mean", "d_y_real_mean", "d_y_fake_mean",
        "loss_identity",
    },
    "cyclevaegan": {
        "total_loss", "G_loss", "D_loss",
        "D_loss_x_real", "D_loss_x_fake", "D_loss_y_real", "D_loss_y_fake",
        "loss_cycle", "loss_gan_g",
        "loss_gan_g_x_real", "loss_gan_g_x_fake",
        "loss_gan_g_y_real", "loss_gan_g_y_fake",
        "loss_kl", "d_x_real_mean", "d_x_fake_mean",
        "d_y_real_mean", "d_y_fake_mean", "loss_identity",
    },
}


@pytest.fixture(scope="module")
def batch():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    return {
        "x": jax.random.uniform(k1, (2, 32, 32, 3)),
        "y": jax.random.uniform(k2, (2, 32, 32, 3)),
    }


def _params_l2(params):
    return float(
        sum(jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(params))
    )


@pytest.mark.parametrize("name", sorted(ARCHITECTURES))
def test_one_train_step(name, batch):
    task = create_task(name, model=MC, paired=True)
    state = task.init_state(jax.random.PRNGKey(0))
    before = _params_l2(state.params)
    step = jax.jit(task.train_step)
    state2, metrics = step(state, batch)

    # metric key schema matches the reference training_step exactly
    # (nan_detected is our jit-safe generalization of the reference guard)
    assert set(metrics) - {"nan_detected"} == EXPECTED_TRAIN_KEYS[name]
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{name}.{k} not finite"
    assert float(metrics["nan_detected"]) == 0.0

    # parameters actually moved and the step counter advanced
    assert _params_l2(state2.params) != before
    assert int(state2.step) == 1

    # a second step with the SAME state must produce a different rng path
    state3, metrics2 = step(state2, batch)
    assert int(state3.step) == 2
    assert np.isfinite(float(metrics2["G_loss"]))


@pytest.mark.parametrize("name", sorted(ARCHITECTURES))
def test_eval_step_outputs(name, batch):
    task = create_task(name, model=MC, paired=True)
    state = task.init_state(jax.random.PRNGKey(0))
    metrics = jax.jit(task.eval_step)(state, batch, jax.random.PRNGKey(1))
    assert metrics["Gx"].shape == batch["x"].shape
    if task.has_fy:
        assert metrics["Fy"].shape == batch["x"].shape
    else:
        assert "Fy" not in metrics
    scalar_keys = [k for k in metrics if k not in ("Gx", "Fy")]
    for k in scalar_keys:
        assert np.isfinite(float(metrics[k])), f"{name}.{k}"
    gx = task.generate(state, batch, jax.random.PRNGKey(2))
    assert gx.shape == batch["x"].shape


def test_unpaired_mode_drops_trans_and_identity(batch):
    task = create_task("cycleae", model=MC, paired=False)
    state = task.init_state(jax.random.PRNGKey(0))
    _, metrics = jax.jit(task.train_step)(state, batch)
    assert "loss_trans" not in metrics

    task = create_task("cyclevaegan", model=MC, paired=False)
    state = task.init_state(jax.random.PRNGKey(0))
    _, metrics = jax.jit(task.train_step)(state, batch)
    assert "loss_identity" not in metrics


def test_nan_guard_skips_update(batch):
    """A non-finite batch must flag nan_detected and leave params unchanged
    (reference guard semantics, Networks.py:356-372)."""
    task = create_task("autoencoder", model=MC)
    state = task.init_state(jax.random.PRNGKey(0))
    bad = {"x": batch["x"] * jnp.nan, "y": batch["y"]}
    state2, metrics = jax.jit(task.train_step)(state, bad)
    assert float(metrics["nan_detected"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_spectral_state_advances(batch):
    """4 power iterations per discriminator per step (2 in-graph + 2
    detached for AEGAN), persisted across steps."""
    task = create_task("aegan", model=MC)
    state = task.init_state(jax.random.PRNGKey(0))
    u0 = np.asarray(
        jax.tree_util.tree_leaves(state.spectral["D"])[1]
    )
    state2, _ = jax.jit(task.train_step)(state, batch)
    u1 = np.asarray(jax.tree_util.tree_leaves(state2.spectral["D"])[1])
    assert not np.allclose(u0, u1)


def test_nan_dump_written_on_poisoned_batch(batch, tmp_path):
    """With nan-dump enabled, a non-finite loss writes a diagnostic .npz
    (loss/batch/params/grads) to <run_dir>/nan_dumps — the TPU equivalent of
    the reference's console dump (Networks.py:356-372)."""
    from vae_cyclegan_tpu.utils import nan_dump

    task = create_task("autoencoder", model=MC)
    state = task.init_state(jax.random.PRNGKey(0))
    bad = {"x": batch["x"] * jnp.nan, "y": batch["y"]}
    nan_dump.enable(tmp_path, max_dumps=2)
    try:
        # fresh jit so the dump callback is traced in
        state2, metrics = jax.jit(task.train_step)(state, bad)
        jax.block_until_ready(state2.params)
        assert float(metrics["nan_detected"]) == 1.0
        dumps = sorted((tmp_path / "nan_dumps").glob("nan_dump_*.npz"))
        assert len(dumps) == 1
        payload = np.load(dumps[0])
        assert not np.isfinite(payload["loss"])
        batch_keys = [k for k in payload.files if k.startswith("batch")]
        grad_keys = [k for k in payload.files if k.startswith("grads")]
        param_keys = [k for k in payload.files if k.startswith("params")]
        assert batch_keys and grad_keys and param_keys
        # healthy step writes nothing new
        _, m2 = jax.jit(task.train_step)(state, batch)
        jax.block_until_ready(m2["G_loss"])
        assert float(m2["nan_detected"]) == 0.0
        assert len(sorted((tmp_path / "nan_dumps").glob("*.npz"))) == 1
    finally:
        nan_dump.disable()
