"""Preemption-safe shutdown (utils.preempt + engine should_stop + driver).

The reference loses up to --save_freq epochs on eviction (its only
recovery is the periodic checkpoint, reference train.py:573-575). Here
the first SIGTERM/SIGINT finishes the in-flight step, saves a resumable
checkpoint_preempt/, and exits 0.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_cyclegan_tpu.config import ModelConfig
from vae_cyclegan_tpu.engine import Engine
from vae_cyclegan_tpu.models.tasks import create_task
from vae_cyclegan_tpu.parallel import make_mesh
from vae_cyclegan_tpu.utils.preempt import GracefulShutdown

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_hypersim(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("preempt_data")
    rng = np.random.RandomState(0)
    for scene in ["ai_001_001_indoor", "ai_001_002_outdoor"]:
        d = root / "hypersim" / scene / "cam_00"
        d.mkdir(parents=True)
        for frame in range(4):
            for mod in ["depth"]:
                arr = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"frame_{frame:04d}_{mod}.png")
    return root


def test_graceful_shutdown_sets_flag_once():
    gs = GracefulShutdown(signals=(signal.SIGUSR1,)).install()
    try:
        assert not gs.requested and not gs()
        os.kill(os.getpid(), signal.SIGUSR1)
        # delivery is synchronous in the main thread at the next bytecode
        time.sleep(0.01)
        assert gs.requested and gs()
    finally:
        gs.uninstall()


def test_graceful_shutdown_second_signal_escalates():
    seen = []
    prev = signal.signal(signal.SIGUSR2, lambda *a: seen.append("prev"))
    gs = GracefulShutdown(signals=(signal.SIGUSR2,)).install()
    try:
        os.kill(os.getpid(), signal.SIGUSR2)
        time.sleep(0.01)
        assert gs.requested and not seen
        # second signal restores + re-delivers to the previous handler
        os.kill(os.getpid(), signal.SIGUSR2)
        time.sleep(0.01)
        assert seen == ["prev"]
    finally:
        gs.uninstall()
        signal.signal(signal.SIGUSR2, prev)


def test_engine_train_epoch_should_stop():
    """should_stop ends the epoch after the in-flight step; partial
    averages still come back finite."""
    task = create_task(
        "autoencoder",
        model=ModelConfig(image_size=32, latent_dim=8, base_width=8,
                          use_pallas=False),
    )
    engine = Engine(task, make_mesh(1))
    state = engine.init_state(seed=0)
    rng = np.random.RandomState(0)
    batches = [
        {"x": rng.rand(2, 32, 32, 3).astype(np.float32),
         "y": rng.rand(2, 32, 32, 3).astype(np.float32)}
        for _ in range(6)
    ]
    steps = 0

    def stop_after_two():
        nonlocal steps
        steps += 1
        return steps >= 2

    state, loss, comps, _ = engine.train_epoch(
        state, batches, progress=False, should_stop=stop_after_two
    )
    assert steps == 2  # polled once per dispatched step, then stopped
    assert np.isfinite(loss)
    assert comps["nan_detected"] == 0.0


@pytest.mark.slow  # full CLI train run + SIGTERM
def test_train_cli_sigterm_saves_resumable_checkpoint(tmp_path, tiny_hypersim):
    """E2E: SIGTERM mid-training -> exit 0 + checkpoint_preempt/ that
    --resume accepts (re-running the interrupted epoch)."""
    out_dir = tmp_path / "runs"
    cmd = [
        sys.executable, str(REPO / "train.py"), "--platform", "cpu",
        "--architecture", "autoencoder", "--dataset", "hypersim",
        "--data_dir", str(tiny_hypersim), "--source_modality", "depth",
        "--target_modality", "depth", "--image_size", "32",
        "--base_width", "8", "--batch_size", "2", "--epochs", "500",
        "--test_split", "0.25", "--output_dir", str(out_dir),
        "--save_freq", "1000", "--log_image_freq", "1000",
        "--num_devices", "1", "--quiet",
    ]
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    # wait until training is in the epoch loop, then preempt
    deadline = time.time() + 600
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("Epoch 2/"):
            break
        if time.time() > deadline:
            proc.kill()
            pytest.fail("training never reached epoch 2:\n" + "".join(lines))
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=600)
    lines.append(rest)
    out = "".join(lines)
    assert proc.returncode == 0, out
    assert "Preemption checkpoint saved" in out
    run_dirs = list(out_dir.glob("autoencoder_*"))
    assert len(run_dirs) == 1
    ckpt = run_dirs[0] / "checkpoint_preempt"
    from vae_cyclegan_tpu.utils import checkpoint_exists

    assert checkpoint_exists(ckpt), out

    # resume re-runs the interrupted epoch and can finish a short run
    resume_cmd = [
        sys.executable, str(REPO / "train.py"), "--platform", "cpu",
        "--architecture", "autoencoder", "--dataset", "hypersim",
        "--data_dir", str(tiny_hypersim), "--source_modality", "depth",
        "--target_modality", "depth", "--image_size", "32",
        "--base_width", "8", "--batch_size", "2", "--epochs", "2",
        "--test_split", "0.25", "--output_dir", str(out_dir),
        "--save_freq", "1000", "--log_image_freq", "1000",
        "--num_devices", "1", "--quiet", "--resume", str(ckpt),
    ]
    done = subprocess.run(resume_cmd, capture_output=True, text=True,
                          timeout=600, env=env)
    assert done.returncode == 0, done.stdout + done.stderr
    assert "Training completed" in done.stdout
