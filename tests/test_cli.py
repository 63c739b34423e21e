"""End-to-end CLI tests: train.py (fresh + resume) and test.py over a tiny
on-disk dataset, run in-process on the CPU backend."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.RandomState(0)
    for scene in ["ai_001_001_indoor", "ai_001_002_outdoor"]:
        d = root / "hypersim" / scene / "cam_00"
        d.mkdir(parents=True)
        for frame in range(4):
            for mod in ["depth", "normal"]:
                arr = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"frame_{frame:04d}_{mod}.png")
    return root


def _train_args(data_root, out_dir, epochs, extra=()):
    import train as train_cli

    parser = train_cli.build_parser()
    return parser.parse_args([
        "--architecture", "vae",
        "--dataset", "hypersim",
        "--data_dir", str(data_root),
        "--source_modality", "depth",
        "--target_modality", "depth",
        "--image_size", "32",
        "--base_width", "8",
        "--latent_dim", "8",
        "--batch_size", "2",
        "--epochs", str(epochs),
        "--test_split", "0.25",
        "--output_dir", str(out_dir),
        "--save_freq", "1",
        "--log_image_freq", "1",
        "--no_pallas",
        "--quiet",
        "--paired",
        "--num_workers", "2",
        *extra,
    ])


@pytest.mark.slow  # full CLI train runs
def test_train_fresh_resume_and_eval(data_root, tmp_path):
    import train as train_cli

    out_root = tmp_path / "runs"
    run_dir = train_cli.main(_train_args(data_root, out_root, epochs=2))

    # reference run-dir layout (train.py:404-412, utils.py layout)
    assert (run_dir / "args.json").exists()
    assert (run_dir / "checkpoint_epoch_1").is_dir()
    assert (run_dir / "checkpoint_epoch_2").is_dir()
    assert (run_dir / "best_model").is_dir()
    tb_files = list((run_dir / "tensorboard").glob("events.out.tfevents.*"))
    assert tb_files, "TensorBoard events missing"
    args_saved = json.loads((run_dir / "args.json").read_text())
    assert args_saved["architecture"] == "vae"

    # resume from epoch-1 checkpoint; TB truncated; continues to epoch 3
    resume_args = _train_args(
        data_root, out_root, epochs=3,
        extra=("--resume", str(run_dir / "checkpoint_epoch_1")),
    )
    run_dir2 = train_cli.main(resume_args)
    assert run_dir2 == run_dir
    assert (run_dir / "checkpoint_epoch_3").is_dir()

    # evaluation driver over the finished run
    import test as test_cli

    eval_out = tmp_path / "test_results"
    eval_args = type("A", (), {
        "runs_dir": str(out_root),
        "data_dir": str(data_root),
        "output_dir": str(eval_out),
        "num_samples": 2,
    })()
    test_cli.evaluate_models(eval_args)
    group_dir = eval_out / "hypersim" / "depth_to_depth"
    summary = json.loads((group_dir / "summary.json").read_text())
    assert summary["num_samples"] == 2
    assert len(summary["l1_to_target"]) == 1
    # reference summary metadata, field-for-field (ref test.py:583-599)
    for key in ("modality", "source_modality", "target_modality",
                "num_models", "unpaired"):
        assert key in summary
    assert summary["num_models"] == 1
    (entry,) = summary["models"]
    assert entry["architecture"] in ("autoencoder", "vae")
    assert "checkpoint" in entry and "training_args" in entry
    assert entry["training_args"].get("architecture") == entry["architecture"]
    # strict-JSON guarantee: no Infinity tokens (PSNR capped at 99 dB)
    json.loads((group_dir / "summary.json").read_text(),
               parse_constant=lambda c: (_ for _ in ()).throw(
                   ValueError(f"non-RFC JSON constant {c}")))
    assert (group_dir / "comparison_sample_000.png").exists()
    assert list(group_dir.glob("grid_*.png"))


def test_train_rejects_mismatched_ae_modalities(data_root, tmp_path):
    import train as train_cli

    args = _train_args(data_root, tmp_path / "runs", epochs=1)
    args.source_modality, args.target_modality = "depth", "normal"
    with pytest.raises(ValueError, match="same for Autoencoder/VAE"):
        train_cli.main(args)


@pytest.mark.slow  # full CLI train runs
def test_pretrain_transfer_pipeline(data_root, tmp_path):
    """doubleae pretraining -> cycleae --pretrained_doubleae, through the
    CLI with the donated jitted step (regression: transferred G/F used to
    alias the same encoder buffers, tripping double-donation)."""
    import train as train_cli

    out_root = tmp_path / "runs"
    pre_args = _train_args(data_root, out_root, epochs=1)
    pre_args.architecture = "doubleae"
    pre_args.source_modality, pre_args.target_modality = "depth", "normal"
    pre_run = train_cli.main(pre_args)

    cyc_args = _train_args(data_root, out_root, epochs=1)
    cyc_args.architecture = "cycleae"
    cyc_args.source_modality, cyc_args.target_modality = "depth", "normal"
    cyc_args.pretrained_doubleae = str(pre_run / "checkpoint_epoch_1")
    cyc_run = train_cli.main(cyc_args)
    assert (cyc_run / "checkpoint_epoch_1").is_dir()

    # wrong-architecture guard (reference train.py:447-449 semantics)
    bad_args = _train_args(data_root, out_root, epochs=1)
    bad_args.pretrained_doubleae = str(pre_run / "checkpoint_epoch_1")
    with pytest.raises(ValueError, match="pretrained_doubleae"):
        train_cli.main(bad_args)


@pytest.mark.slow  # full CLI train runs
def test_pretrain_transfer_pipeline_doublevae(data_root, tmp_path):
    """doublevae pretraining -> cyclevaegan --pretrained_doublevae, the full
    CLI chain the reference runs at train.py:443-460 + utils.py:124-239:
    the transfer sanity asserts (G holds B components, F holds A) run inside
    load_pretrained_doublevae_to_cycle, and the downstream flagship epoch
    must produce finite losses."""
    import math

    import train as train_cli

    out_root = tmp_path / "runs"
    pre_args = _train_args(data_root, out_root, epochs=1)
    pre_args.architecture = "doublevae"
    pre_args.source_modality, pre_args.target_modality = "depth", "normal"
    pre_run = train_cli.main(pre_args)
    pre_meta = json.loads(
        (pre_run / "checkpoint_epoch_1" / "meta.json").read_text()
    )
    assert math.isfinite(pre_meta["loss"])

    cyc_args = _train_args(data_root, out_root, epochs=1)
    cyc_args.architecture = "cyclevaegan"
    cyc_args.source_modality, cyc_args.target_modality = "depth", "normal"
    cyc_args.pretrained_doublevae = str(pre_run / "checkpoint_epoch_1")
    cyc_run = train_cli.main(cyc_args)
    assert (cyc_run / "checkpoint_epoch_1").is_dir()
    cyc_meta = json.loads(
        (cyc_run / "checkpoint_epoch_1" / "meta.json").read_text()
    )
    assert math.isfinite(cyc_meta["loss"])

    # wrong-architecture guard (reference train.py:453-455 semantics)
    bad_args = _train_args(data_root, out_root, epochs=1)
    bad_args.pretrained_doublevae = str(pre_run / "checkpoint_epoch_1")
    with pytest.raises(ValueError, match="pretrained_doublevae"):
        train_cli.main(bad_args)


def test_eval_driver_legacy_ab_batch_keys():
    """The eval driver accepts legacy 'A'/'B' batch keys (reference
    test.py:301-303)."""
    import importlib.util
    from pathlib import Path

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "eval_driver", Path(__file__).resolve().parents[1] / "test.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a = np.zeros((1, 4, 4, 3), np.float32)
    b = np.ones((1, 4, 4, 3), np.float32)
    out = mod.normalize_batch_keys({"A": a, "B": b})
    np.testing.assert_array_equal(out["x"], a)
    np.testing.assert_array_equal(out["y"], b)
    # single-key legacy batch: y falls back to A (x == y)
    out1 = mod.normalize_batch_keys({"A": a})
    np.testing.assert_array_equal(out1["y"], a)
    # modern batches pass through untouched
    modern = {"x": a, "y": b}
    assert mod.normalize_batch_keys(modern) is modern


def test_eval_driver_architecture_and_dataset_filters(monkeypatch):
    """--architectures / --dataset_filter route only matching runs into
    evaluation (reference test.py:706-711)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "eval_driver_f", Path(__file__).resolve().parents[1] / "test.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fake_runs = [
        {"run_dir": Path(n), "name": n, "checkpoint": Path(n) / "best_model",
         "args": {"architecture": a, "dataset": d}}
        for n, a, d in [
            ("r1", "vae", "hypersim"),
            ("r2", "aegan", "hypersim"),
            ("r3", "vae", "maps"),
        ]
    ]
    monkeypatch.setattr(mod, "discover_runs", lambda d: list(fake_runs))
    routed = []
    monkeypatch.setattr(
        mod, "evaluate_model_group",
        lambda ds, group, args: routed.append((ds, sorted(r["name"] for r in group))),
    )

    def _args(**kw):
        base = {"runs_dir": ".", "architectures": None, "dataset_filter": None}
        base.update(kw)
        return type("A", (), base)()

    mod.evaluate_models(_args(architectures=["vae"]))
    assert routed == [("hypersim", ["r1"]), ("maps", ["r3"])]
    routed.clear()
    mod.evaluate_models(_args(dataset_filter="maps"))
    assert routed == [("maps", ["r3"])]
    routed.clear()
    mod.evaluate_models(_args(architectures=["aegan"], dataset_filter="maps"))
    assert routed == []  # both filters: nothing qualifies


def test_metrics_ssim_psnr_properties():
    import numpy as np

    from vae_cyclegan_tpu.utils.metrics import psnr, ssim

    rng = np.random.RandomState(0)
    a = rng.rand(48, 48, 3)
    assert abs(ssim(a, a) - 1.0) < 1e-9
    # exact match caps at a finite ceiling so summary.json stays RFC JSON
    from vae_cyclegan_tpu.utils.metrics import PSNR_CAP_DB

    assert psnr(a, a) == PSNR_CAP_DB
    slightly = np.clip(a + rng.randn(48, 48, 3) * 0.02, 0, 1)
    very = np.clip(a + rng.randn(48, 48, 3) * 0.3, 0, 1)
    assert ssim(a, slightly) > ssim(a, very) > 0
    assert psnr(a, slightly) > psnr(a, very) > 0
