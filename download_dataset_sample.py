#!/usr/bin/env python3
"""Offline Hypersim sampler — TPU-framework rebuild of the reference tool
(reference download_dataset_sample.py, 478 LoC).

Downloads a diversity-maximized sample of the Apple Hypersim dataset by
reading single frames out of the remote per-scene ZIPs with HTTP Range
requests (no full-scene downloads), converting HDF5 modalities to PNG with
per-modality normalization, and writing the exact on-disk layout
`output_dir/{scene}_{type}/cam_XX/frame_NNNN_{modality}.png` that
`vae_cyclegan_tpu.data.HypersimDataset` consumes.

Usage:
    python download_dataset_sample.py --num_images 100 \
        --modalities depth semantic normal \
        --repo_path /path/to/ml-hypersim --output_dir dataset/hypersim

The planning stage is deterministic given --seed (reference :206-272); the
metadata CSVs come from the public apple/ml-hypersim repo.
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from collections import defaultdict
from pathlib import Path

import numpy as np

BASE_URL = (
    "https://docs-assets.developer.apple.com/ml-research/datasets/hypersim/"
    "v1/scenes/"
)

# (modality, source file inside the scene zip, is_hdf5, source subdir)
MODALITIES_CONFIG = [
    ("color", "tonemap.jpg", False, "final_preview"),
    ("depth", "depth_meters.hdf5", True, "geometry_hdf5"),
    ("semantic", "semantic.hdf5", True, "geometry_hdf5"),
    ("semantic_instance", "semantic_instance.hdf5", True, "geometry_hdf5"),
    ("normal", "normal_cam.hdf5", True, "geometry_hdf5"),
    ("normal_world", "normal_world.hdf5", True, "geometry_hdf5"),
    ("normal_bump", "normal_bump_cam.hdf5", True, "geometry_hdf5"),
    ("position", "position.hdf5", True, "geometry_hdf5"),
    ("render_entity_id", "render_entity_id.hdf5", True, "geometry_hdf5"),
]

MODALITY_MAPPINGS = {
    name: {
        "pattern": f"scene_cam_{{cam}}_{src_dir}/frame.{{frame:04d}}.{src}",
        "is_hdf5": is_hdf5,
        "output_name": f"{name}.png",
    }
    for name, src, is_hdf5, src_dir in MODALITIES_CONFIG
}


class WebFile:
    """Seekable file view over an HTTP URL using Range requests, suitable
    for zipfile's random access (reference :66-111)."""

    def __init__(self, url, session):
        with session.head(url) as response:
            size = int(response.headers["content-length"])
        self.url = url
        self.session = session
        self.offset = 0
        self.size = size

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self.offset

    def available(self) -> int:
        return self.size - self.offset

    def seek(self, offset, whence=0) -> None:
        if whence == 0:
            self.offset = offset
        elif whence == 1:
            self.offset = min(self.offset + offset, self.size)
        elif whence == 2:
            self.offset = max(0, self.size + offset)

    def read(self, n=None) -> bytes:
        n = self.available() if n is None else min(n, self.available())
        headers = {"Range": f"bytes={self.offset}-{self.offset + n - 1}"}
        with self.session.get(self.url, headers=headers) as response:
            data = response.content
        self.offset += len(data)
        return data


def normalize_for_display(data: np.ndarray) -> np.ndarray:
    """Min-max normalize finite values to [0,1]; non-finite -> 0."""
    data = np.asarray(data, dtype=np.float32)
    valid = np.isfinite(data)
    if not np.any(valid):
        return np.zeros_like(data)
    lo, hi = float(data[valid].min()), float(data[valid].max())
    if hi - lo < 1e-10:
        return np.zeros_like(data)
    out = (data - lo) / (hi - lo)
    out[~valid] = 0.0
    return out


def convert_hdf5_to_png(hdf5_data: np.ndarray, modality_name: str, output_path):
    """Per-modality conversion (reference :134-168): segmentation -> tab20
    colormap; normals -> [-1,1] to [0,1]; depth/position -> plasma."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    data = np.asarray(hdf5_data)

    if "semantic" in modality_name or "render_entity_id" in modality_name:
        if data.ndim == 2:
            img = plt.get_cmap("tab20")(normalize_for_display(data))[:, :, :3]
        else:
            img = normalize_for_display(data)
    elif "normal" in modality_name:
        img = np.clip((data + 1.0) / 2.0, 0.0, 1.0)
    elif "depth" in modality_name or "position" in modality_name:
        if data.ndim == 2:
            img = plt.get_cmap("plasma")(normalize_for_display(data))[:, :, :3]
        else:
            img = normalize_for_display(data)
    else:
        img = normalize_for_display(data)

    plt.imsave(output_path, np.asarray(img))
    return output_path


def load_scene_metadata(repo_path=None) -> dict:
    """scene_name -> scene_type from metadata_camera_trajectories.csv."""
    import pandas as pd

    base = Path(repo_path) if repo_path else Path("../../")
    metadata_path = (
        base / "evermotion_dataset" / "analysis"
        / "metadata_camera_trajectories.csv"
    )
    if not metadata_path.exists():
        print(f"Metadata not found: {metadata_path}")
        return {}
    df = pd.read_csv(metadata_path)
    scene_types = {}
    for _, row in df.iterrows():
        scene_name = "_".join(str(row["Animation"]).split("_")[:3])
        scene_types.setdefault(scene_name, row["Scene type"])
    return scene_types


def scene_name_with_type(scene_name: str, scene_types: dict) -> str:
    t = str(scene_types.get(scene_name, "unknown")).lower()
    t = t.replace(" ", "_").replace("(", "").replace(")", "")
    return f"{scene_name}_{t}"


def plan_download(num_images: int, seed: int = 42, repo_path=None,
                  metadata_df=None) -> list:
    """Deterministic diversity-maximizing plan: round-robin over sorted
    scenes, first camera, uniformly spaced frames (reference :206-272).
    Returns [(scene_name, camera_name, frame_id), ...]."""
    import pandas as pd

    np.random.seed(seed)
    if metadata_df is None:
        base = Path(repo_path) if repo_path else Path("../../")
        metadata_path = (
            base / "evermotion_dataset" / "analysis" / "metadata_images.csv"
        )
        if not metadata_path.exists():
            raise FileNotFoundError(f"Metadata not found: {metadata_path}")
        metadata_df = pd.read_csv(metadata_path)

    df = metadata_df[metadata_df["included_in_public_release"] == True]  # noqa: E712
    scenes = sorted(df["scene_name"].unique())
    if not scenes:
        return []

    plan = []
    while len(plan) < num_images:
        progressed = False
        for scene in scenes:
            if len(plan) >= num_images:
                break
            scene_data = df[df["scene_name"] == scene]
            if len(scene_data) == 0:
                continue
            camera = sorted(scene_data["camera_name"].unique())[0]
            frames = sorted(
                scene_data[scene_data["camera_name"] == camera]["frame_id"]
                .unique()
            )
            if not frames:
                continue
            frame_idx = (len(plan) // len(scenes)) % len(frames)
            plan.append((scene, camera, frames[min(frame_idx, len(frames) - 1)]))
            progressed = True
        if not progressed:
            break
    return plan[:num_images]


def download_and_convert(zf: zipfile.ZipFile, scene_name, camera_name,
                         frame_id, modalities, output_dir, scene_types,
                         temp_dir, verbose=True) -> int:
    """Extract + convert one frame's modalities from an open scene ZIP.
    Returns the number of modalities written."""
    import h5py
    from PIL import Image

    out_scene_dir = (
        Path(output_dir) / scene_name_with_type(scene_name, scene_types)
        / camera_name
    )
    out_scene_dir.mkdir(parents=True, exist_ok=True)
    names = set(zf.namelist())
    cam_num = camera_name.replace("cam_", "")
    count = 0
    for modality in modalities:
        mapping = MODALITY_MAPPINGS.get(modality)
        if mapping is None:
            print(f"  unknown modality: {modality}")
            continue
        member = (
            f"{scene_name}/images/"
            + mapping["pattern"].format(cam=cam_num, frame=frame_id)
        )
        if member not in names:
            if verbose:
                print(f"  missing in zip: {member}")
            continue
        out_path = out_scene_dir / f"frame_{frame_id:04d}_{mapping['output_name']}"
        if out_path.exists():
            count += 1
            continue
        if mapping["is_hdf5"]:
            tmp = Path(temp_dir) / f"temp_{modality}.hdf5"
            with zf.open(member) as src, open(tmp, "wb") as dst:
                dst.write(src.read())
            with h5py.File(tmp, "r") as hf:
                data = hf["dataset"][:]
            convert_hdf5_to_png(data, modality, out_path)
            tmp.unlink()
        else:
            with zf.open(member) as src:
                img = Image.open(src)
                img.save(out_path)
        count += 1
        if verbose:
            print(f"  wrote {out_path.name}")
    return count


def open_scene_zip(scene_name: str, base_url: str, session=None):
    """Open a scene ZIP either over HTTP-Range or from a local directory
    (local base lets the tool run in zero-egress environments/tests)."""
    if base_url.startswith("http"):
        import requests

        session = session or requests.session()
        return zipfile.ZipFile(WebFile(f"{base_url}{scene_name}.zip", session))
    return zipfile.ZipFile(Path(base_url) / f"{scene_name}.zip")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Download a diversity-maximized Hypersim sample"
    )
    parser.add_argument("--num_images", type=int, required=True)
    parser.add_argument("--modalities", nargs="+", required=True,
                        help='modality names or "all_modalities"')
    parser.add_argument("--output_dir", type=str, default="hypersim_sample")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--repo_path", type=str, default=None,
                        help="path to the cloned apple/ml-hypersim repo")
    parser.add_argument("--base_url", type=str, default=BASE_URL,
                        help="scene-zip base URL, or a local directory of "
                             "{scene}.zip files")
    args = parser.parse_args(argv)

    if "all_modalities" in args.modalities:
        modalities = list(MODALITY_MAPPINGS)
    else:
        modalities = args.modalities
        invalid = [m for m in modalities if m not in MODALITY_MAPPINGS]
        if invalid:
            print(f"Invalid modalities: {invalid}")
            print(f"Available: {list(MODALITY_MAPPINGS)}")
            return 1

    output_dir = Path(args.output_dir)
    temp_dir = output_dir / "_temp"
    temp_dir.mkdir(parents=True, exist_ok=True)

    scene_types = load_scene_metadata(repo_path=args.repo_path)
    plan = plan_download(args.num_images, seed=args.seed,
                         repo_path=args.repo_path)
    print(f"Planned {len(plan)} frames across "
          f"{len({s for s, _, _ in plan})} scenes")

    by_scene = defaultdict(list)
    for scene_name, camera_name, frame_id in plan:
        by_scene[scene_name].append((camera_name, frame_id))

    ok = failed = 0
    for scene_name, frames in by_scene.items():
        try:
            zf = open_scene_zip(scene_name, args.base_url)
        except Exception as e:  # noqa: BLE001
            print(f"cannot open scene zip {scene_name}: {e}")
            failed += len(frames)
            continue
        with zf:
            for camera_name, frame_id in frames:
                n = download_and_convert(
                    zf, scene_name, camera_name, frame_id, modalities,
                    output_dir, scene_types, temp_dir, verbose=False,
                )
                ok += 1 if n else 0
                failed += 0 if n else 1

    import shutil

    shutil.rmtree(temp_dir, ignore_errors=True)
    print(f"Done: {ok}/{len(plan)} frames written, {failed} failed, "
          f"output: {output_dir.absolute()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
