#!/usr/bin/env python3
"""Visualize all modalities of one Hypersim frame — rebuild of the
reference show_modalities.py (189 LoC): saves a labeled grid plus
individual PNGs for every modality present in a downloaded scene."""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image

ALL_MODALITIES = [
    "color",
    "depth",
    "normal",
    "normal_bump",
    "normal_world",
    "position",
    "render_entity_id",
    "semantic",
    "semantic_instance",
]

MODALITY_DESCRIPTIONS = {
    "color": "RGB Color Image",
    "depth": "Depth Map (distance from camera)",
    "normal": "Surface Normals (camera space)",
    "normal_bump": "Bump-mapped Normals",
    "normal_world": "Surface Normals (world space)",
    "position": "3D Position Map",
    "render_entity_id": "Entity/Object ID",
    "semantic": "Semantic Segmentation",
    "semantic_instance": "Instance Segmentation",
}


def find_sample_frame(dataset_dir: str, scene_name=None, frame_id="0000"):
    dataset_path = Path(dataset_dir)
    scenes = sorted(d for d in dataset_path.iterdir() if d.is_dir())
    if not scenes:
        raise ValueError(f"No scenes found in {dataset_dir}")
    scene_dir = dataset_path / scene_name if scene_name else scenes[0]
    if not scene_dir.exists():
        raise ValueError(f"Scene {scene_name} not found")
    cam_dirs = sorted(scene_dir.glob("cam_*"))
    if not cam_dirs:
        raise ValueError(f"No camera directories found in {scene_dir}")
    return scene_dir.name, cam_dirs[0].name, frame_id, cam_dirs[0]


def load_all_modalities(cam_dir: Path, frame_id: str) -> dict:
    out = {}
    for modality in ALL_MODALITIES:
        path = cam_dir / f"frame_{frame_id}_{modality}.png"
        if path.exists():
            out[modality] = np.array(Image.open(path))
        else:
            print(f"  Warning: {modality} not found at {path}")
            out[modality] = None
    return out


def save_modality_grid(modalities: dict, output_dir, scene_name, frame_id):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    present = [m for m in ALL_MODALITIES if modalities.get(m) is not None]
    n_cols = 3
    n_rows = (len(present) + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(15, 5 * n_rows),
                             squeeze=False)
    flat = axes.ravel()
    for idx, modality in enumerate(present):
        flat[idx].imshow(modalities[modality])
        flat[idx].set_title(
            f"{modality}\n({MODALITY_DESCRIPTIONS[modality]})", fontsize=10
        )
    for ax in flat:
        ax.axis("off")
    plt.suptitle(
        f"Hypersim Dataset Modalities\nScene: {scene_name}, Frame: {frame_id}",
        fontsize=14,
    )
    plt.tight_layout()
    os.makedirs(output_dir, exist_ok=True)
    grid_path = os.path.join(output_dir, f"modalities_grid_{scene_name}.png")
    plt.savefig(grid_path, dpi=150, bbox_inches="tight")
    plt.close()
    print(f"Saved grid to {grid_path}")
    return grid_path


def save_individual_modalities(modalities: dict, output_dir, scene_name,
                               frame_id):
    individual_dir = os.path.join(output_dir, f"individual_{scene_name}")
    os.makedirs(individual_dir, exist_ok=True)
    saved = []
    for modality, arr in modalities.items():
        if arr is None:
            continue
        path = os.path.join(individual_dir, f"{modality}.png")
        Image.fromarray(arr).save(path)
        saved.append(path)
    print(f"  Saved {len(saved)} individual modality images to {individual_dir}")
    return saved


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Visualize all modalities of one Hypersim frame"
    )
    parser.add_argument("--dataset", type=str, default="dataset/hypersim")
    parser.add_argument("--scene", type=str, default=None)
    parser.add_argument("--frame", type=str, default="0000")
    parser.add_argument("--output", type=str, default="modalities_examples")
    args = parser.parse_args(argv)

    scene_name, cam_name, frame_id, cam_dir = find_sample_frame(
        args.dataset, args.scene, args.frame
    )
    print(f"Using {scene_name}/{cam_name}/frame_{frame_id}")
    modalities = load_all_modalities(cam_dir, frame_id)
    save_modality_grid(modalities, args.output, scene_name, frame_id)
    save_individual_modalities(modalities, args.output, scene_name, frame_id)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
