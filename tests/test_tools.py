"""Offline tests for the dataset tooling (download_dataset_sample /
show_modalities) using a local scene ZIP — no network."""

import sys
import zipfile
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import download_dataset_sample as dds  # noqa: E402
import show_modalities as smod  # noqa: E402


@pytest.fixture(scope="module")
def scene_zip_dir(tmp_path_factory):
    """Build ai_001_001.zip with the real Hypersim internal layout."""
    root = tmp_path_factory.mktemp("zips")
    tmp = tmp_path_factory.mktemp("scene_src")
    rng = np.random.RandomState(0)

    scene = "ai_001_001"
    img_dir = tmp / scene / "images"
    prev = img_dir / "scene_cam_00_final_preview"
    geom = img_dir / "scene_cam_00_geometry_hdf5"
    prev.mkdir(parents=True)
    geom.mkdir(parents=True)
    for frame in (0, 1):
        Image.fromarray((rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
            prev / f"frame.{frame:04d}.tonemap.jpg"
        )
        for mod_file, data in [
            ("depth_meters.hdf5", rng.rand(24, 32).astype(np.float32) * 10),
            ("normal_cam.hdf5", rng.rand(24, 32, 3).astype(np.float32) * 2 - 1),
            ("semantic.hdf5", rng.randint(0, 20, (24, 32)).astype(np.int16)),
        ]:
            with h5py.File(geom / f"frame.{frame:04d}.{mod_file}", "w") as hf:
                hf.create_dataset("dataset", data=data)

    zip_path = root / f"{scene}.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted(tmp.rglob("*")):
            if p.is_file():
                zf.write(p, p.relative_to(tmp))
    return root


def test_plan_download_deterministic():
    df = pd.DataFrame({
        "scene_name": ["ai_001_001"] * 4 + ["ai_001_002"] * 4,
        "camera_name": ["cam_00", "cam_00", "cam_01", "cam_01"] * 2,
        "frame_id": [0, 1, 0, 1] * 2,
        "included_in_public_release": [True] * 7 + [False],
    })
    plan1 = dds.plan_download(4, seed=1, metadata_df=df)
    plan2 = dds.plan_download(4, seed=1, metadata_df=df)
    assert plan1 == plan2
    assert len(plan1) == 4
    # diversity: first picks round-robin over scenes, first camera
    assert plan1[0][0] == "ai_001_001" and plan1[1][0] == "ai_001_002"
    assert all(cam == "cam_00" for _, cam, _ in plan1)


def test_convert_hdf5_modalities(tmp_path):
    depth = np.random.RandomState(0).rand(16, 16).astype(np.float32) * 5
    out = dds.convert_hdf5_to_png(depth, "depth", tmp_path / "d.png")
    img = np.array(Image.open(out))
    assert img.shape[:2] == (16, 16) and img.shape[2] >= 3

    normal = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32) * 2 - 1
    out = dds.convert_hdf5_to_png(normal, "normal", tmp_path / "n.png")
    assert np.array(Image.open(out)).shape[:2] == (16, 16)

    sem = np.arange(256).reshape(16, 16).astype(np.int32)
    out = dds.convert_hdf5_to_png(sem, "semantic", tmp_path / "s.png")
    assert np.array(Image.open(out)).shape[:2] == (16, 16)

    # non-finite data must not crash (depth maps contain inf at sky pixels)
    bad = np.full((8, 8), np.inf, np.float32)
    dds.convert_hdf5_to_png(bad, "depth", tmp_path / "inf.png")


def test_download_from_local_zip(scene_zip_dir, tmp_path):
    """End-to-end extraction from a local scene zip into the training
    layout consumed by HypersimDataset."""
    zf = dds.open_scene_zip("ai_001_001", str(scene_zip_dir))
    temp = tmp_path / "_temp"
    temp.mkdir()
    with zf:
        n = dds.download_and_convert(
            zf, "ai_001_001", "cam_00", 0,
            ["color", "depth", "normal", "semantic"],
            tmp_path, {"ai_001_001": "living room"}, temp, verbose=False,
        )
    assert n == 4
    out_dir = tmp_path / "ai_001_001_living_room" / "cam_00"
    for mod in ["color", "depth", "normal", "semantic"]:
        assert (out_dir / f"frame_0000_{mod}.png").exists()

    # the produced tree is directly consumable by the training dataset
    import random

    from vae_cyclegan_tpu.data import HypersimDataset

    ds = HypersimDataset(str(tmp_path), ["depth", "normal"], paired_mode=True)
    assert len(ds) == 1
    item = ds.get(0, random.Random(0))
    assert item["x"].shape == (24, 32, 3)


def test_show_modalities(scene_zip_dir, tmp_path):
    # build a frame dir with two modalities then render the grid
    zf = dds.open_scene_zip("ai_001_001", str(scene_zip_dir))
    temp = tmp_path / "_temp"
    temp.mkdir()
    data_dir = tmp_path / "data"
    with zf:
        dds.download_and_convert(
            zf, "ai_001_001", "cam_00", 0, ["color", "depth"],
            data_dir, {}, temp, verbose=False,
        )
    scene, cam, frame_id, cam_dir = smod.find_sample_frame(str(data_dir))
    mods = smod.load_all_modalities(cam_dir, frame_id)
    assert mods["color"] is not None and mods["depth"] is not None
    grid = smod.save_modality_grid(mods, str(tmp_path / "viz"), scene, frame_id)
    assert Path(grid).exists()
    saved = smod.save_individual_modalities(
        mods, str(tmp_path / "viz"), scene, frame_id
    )
    assert len(saved) == 2
