"""Offline tests for the dataset tooling (vae_cyclegan_tpu.data.tools)
using a local scene ZIP — no network."""

import zipfile
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from vae_cyclegan_tpu.data import tools


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


def _catalog(df, types=None):
    return tools.HypersimCatalog(df, types)


def test_spread_plan_deterministic_and_diverse():
    df = pd.DataFrame({
        "scene_name": ["ai_001_001"] * 4 + ["ai_001_002"] * 4,
        "camera_name": ["cam_00", "cam_00", "cam_01", "cam_01"] * 2,
        "frame_id": [0, 1, 0, 1] * 2,
        "included_in_public_release": [True] * 7 + [False],
    })
    plan1 = _catalog(df).spread(4)
    plan2 = _catalog(df).spread(4)
    assert plan1 == plan2
    # round-robin over scenes, first camera only
    assert [r.scene for r in plan1[:2]] == ["ai_001_001", "ai_001_002"]
    assert all(r.cam == "cam_00" for r in plan1)
    # never selects duplicates, even when asked for more than exists
    big = _catalog(df).spread(100)
    assert len(big) == len(set(big)) == 4  # 2 public cam_00 frames per scene


def test_scene_label():
    cat = _catalog(
        pd.DataFrame({
            "scene_name": [], "camera_name": [], "frame_id": [],
            "included_in_public_release": pd.Series([], dtype=bool),
        }),
        {"ai_001_001": "Living room (x)"},
    )
    assert cat.scene_label("ai_001_001") == "ai_001_001_living_room_x"
    assert cat.scene_label("ai_999_999") == "ai_999_999_unknown"


def test_render_styles(tmp_path):
    depth = np.random.RandomState(0).rand(16, 16).astype(np.float32) * 5
    img = tools.render("depth", depth)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    normal = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32) * 2 - 1
    assert tools.render("normal", normal).shape == (16, 16, 3)

    sem = np.arange(256).reshape(16, 16).astype(np.int32)
    assert tools.render("semantic", sem).shape == (16, 16, 3)

    # 3-channel scalar fields (position) skip the colormap
    pos = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    assert tools.render("position", pos).shape == (8, 8, 3)

    # non-finite data must not crash (depth maps contain inf at sky pixels)
    bad = np.full((8, 8), np.inf, np.float32)
    assert tools.render("depth", bad).shape == (8, 8, 3)


def test_sample_from_local_zip(scene_zip_dir, tmp_path):
    """End-to-end extraction from a local scene zip into the training
    layout consumed by HypersimDataset."""
    ref = tools.FrameRef("ai_001_001", "cam_00", 0)
    with tools.SceneArchive.open("ai_001_001", str(scene_zip_dir)) as ar:
        assert ar.has(ref, "depth") and not ar.has(ref, "position")
        n = tools.export_frame(
            ar, ref, ["color", "depth", "normal", "semantic"],
            tmp_path, "ai_001_001_living_room",
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


def test_show_pipeline(scene_zip_dir, tmp_path):
    data_dir = tmp_path / "data"
    with tools.SceneArchive.open("ai_001_001", str(scene_zip_dir)) as ar:
        for frame in (0, 1):
            tools.export_frame(
                ar, tools.FrameRef("ai_001_001", "cam_00", frame),
                ["color", "depth"], data_dir, "ai_001_001_unknown",
            )
    frames = tools.scan_tree(data_dir)
    assert len(frames) == 2
    ref = tools.pick_frame(frames)
    assert ref.frame == 0
    # picking a frame that doesn't exist raises instead of fabricating it
    with pytest.raises(FileNotFoundError):
        tools.pick_frame(frames, frame=7)
    ref = tools.pick_frame(frames, frame=1)
    images = {m: np.asarray(Image.open(p)) for m, p in frames[ref].items()}
    sheet = tools.contact_sheet(images, "t", tmp_path / "viz" / "grid.png")
    assert sheet.exists()
    saved = tools.export_pngs(images, tmp_path / "viz" / "individual")
    assert len(saved) == 2


def test_cli_subcommands(scene_zip_dir, tmp_path, capsys):
    data_dir = tmp_path / "sampled"
    # plan from a metadata CSV tree
    repo = tmp_path / "ml-hypersim"
    analysis = repo / "evermotion_dataset" / "analysis"
    analysis.mkdir(parents=True)
    pd.DataFrame({
        "scene_name": ["ai_001_001"] * 2,
        "camera_name": ["cam_00"] * 2,
        "frame_id": [0, 1],
        "included_in_public_release": [True, True],
    }).to_csv(analysis / "metadata_images.csv", index=False)
    pd.DataFrame({
        "Animation": ["ai_001_001_cam_00"], "Scene type": ["living room"],
    }).to_csv(analysis / "metadata_camera_trajectories.csv", index=False)

    rc = tools.main([
        "sample", "--num_images", "2", "--modalities", "depth", "color",
        "--output_dir", str(data_dir), "--repo_path", str(repo),
        "--base_url", str(scene_zip_dir),
    ])
    assert rc == 0
    pngs = sorted(data_dir.rglob("*.png"))
    assert len(pngs) == 4
    assert pngs[0].parent.parent.name == "ai_001_001_living_room"

    rc = tools.main([
        "show", "--dataset", str(data_dir),
        "--output", str(tmp_path / "viz"),
    ])
    assert rc == 0
    assert (tmp_path / "viz" / "modalities_grid_ai_001_001_living_room.png").exists()

    # unknown modality -> error exit
    assert tools.main([
        "sample", "--num_images", "1", "--modalities", "nope",
        "--repo_path", str(repo), "--base_url", str(scene_zip_dir),
    ]) == 1
