"""Data pipeline tests over a synthetic on-disk fixture exercising all three
dataset layouts (SURVEY.md §4 test plan item c)."""

import random

import numpy as np
import pytest
from PIL import Image

from vae_cyclegan_tpu.data import (
    AugmentConfig,
    ColorJitterConfig,
    DataLoader,
    HypersimDataset,
    SatelliteMapDataset,
    Subset,
    Summer2WinterDataset,
    split_dataset,
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.RandomState(0)
    # hypersim tree
    for scene in ["ai_001_001_indoor", "ai_002_001_outdoor"]:
        for cam in ["cam_00", "cam_01"]:
            d = root / "hypersim" / scene / cam
            d.mkdir(parents=True)
            for frame in range(3):
                for mod in ["depth", "normal", "color"]:
                    arr = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        d / f"frame_{frame:04d}_{mod}.png"
                    )
    # maps side-by-side
    (root / "maps" / "train").mkdir(parents=True)
    for i in range(4):
        arr = (rng.rand(30, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "maps" / "train" / f"{i}.jpg")
    # summer2winter A/B
    for sub in ["trainA", "trainB"]:
        (root / "summer2winter" / sub).mkdir(parents=True)
        n = 3 if sub == "trainA" else 5
        for i in range(n):
            arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / "summer2winter" / sub / f"{i}.jpg")
    return root


def test_hypersim_scan_and_paired(dataset_root):
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"], paired_mode=True
    )
    assert len(ds) == 2 * 2 * 3
    assert ds.get_unique_scenes() == ["ai_001_001", "ai_002_001"]
    assert ds.get_unique_scene_types() == ["indoor", "outdoor"]
    item = ds.get(0, random.Random(0))
    assert item["x"].shape == (40, 56, 3)
    assert item["x"].dtype == np.float32
    assert 0.0 <= item["x"].min() and item["x"].max() <= 1.0


def test_hypersim_single_modality_x_equals_y(dataset_root):
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth"], paired_mode=True
    )
    item = ds.get(3, random.Random(0))
    np.testing.assert_array_equal(item["x"], item["y"])


def test_hypersim_synchronized_augmentation(dataset_root):
    """Paired mode: x and y must receive IDENTICAL spatial transforms.
    depth==normal pixel content differs, but flips/crops must align; use the
    single-modality dataset where x==y exactly iff transforms are synced."""
    aug = AugmentConfig(out_size=24, hflip_p=0.5, vflip_p=0.5)
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth"], augment=aug, paired_mode=True
    )
    for i in range(5):
        item = ds.get(i, random.Random(i))
        np.testing.assert_array_equal(item["x"], item["y"])
        assert item["x"].shape == (24, 24, 3)


def test_hypersim_unpaired_independent_draws(dataset_root):
    aug = AugmentConfig(out_size=24, hflip_p=0.5)
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=aug, paired_mode=False,
    )
    a = ds.get(0, random.Random(0))
    b = ds.get(0, random.Random(1))
    # different rng -> (almost surely) different unpaired partner/augment
    assert not np.array_equal(a["y"], b["y"])


def test_scene_filtering(dataset_root):
    ds = HypersimDataset(str(dataset_root / "hypersim"), ["depth"])
    indoor = ds.filter_by_scene_type(["indoor"])
    assert len(indoor) == 2 * 3
    one_scene = ds.filter_by_scene(["ai_002_001"])
    assert len(one_scene) == 2 * 3


def test_maps_halves_synchronized(dataset_root):
    aug = AugmentConfig(out_size=16, hflip_p=1.0)  # force flip on both halves
    ds = SatelliteMapDataset(str(dataset_root / "maps"), "train", augment=aug)
    assert len(ds) == 4
    item = ds.get(0, random.Random(0))
    assert item["x"].shape == item["y"].shape == (16, 16, 3)


def test_summer2winter_lengths_and_random_partner(dataset_root):
    ds = Summer2WinterDataset(str(dataset_root / "summer2winter"), "train")
    assert len(ds) == 5  # max(lenA=3, lenB=5), Data_Manager.py:433-434
    item = ds.get(4, random.Random(0))  # idx 4 wraps A via idx % lenA
    assert item["x"].shape == (32, 32, 3)


def test_split_dataset_deterministic(dataset_root):
    ds = HypersimDataset(str(dataset_root / "hypersim"), ["depth"])
    tr1, te1 = split_dataset(ds, 0.25, seed=42)
    tr2, te2 = split_dataset(ds, 0.25, seed=42)
    assert tr1.indices == tr2.indices and te1.indices == te2.indices
    assert len(tr1) + len(te1) == len(ds)
    assert set(tr1.indices).isdisjoint(te1.indices)


def test_loader_batching_and_reproducibility(dataset_root):
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=AugmentConfig(out_size=16), paired_mode=True,
    )
    loader = DataLoader(ds, batch_size=5, shuffle=True, seed=7, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 12 samples / 5 -> 3 batches (last partial)
    assert batches[0]["x"].shape == (5, 16, 16, 3)
    assert batches[-1]["x"].shape == (2, 16, 16, 3)
    # same seed + same epoch -> identical stream
    loader2 = DataLoader(ds, batch_size=5, shuffle=True, seed=7, num_workers=4)
    batches2 = list(loader2)
    np.testing.assert_array_equal(batches[0]["x"], batches2[0]["x"])
    # next epoch reshuffles
    loader.set_epoch(1)
    batches3 = list(loader)
    assert not np.array_equal(batches[0]["x"], batches3[0]["x"])


def test_loader_drop_last(dataset_root):
    ds = SatelliteMapDataset(str(dataset_root / "maps"), "train")
    loader = DataLoader(ds, batch_size=3, drop_last=True)
    assert len(loader) == 1
    assert [b["x"].shape[0] for b in loader] == [3]


def test_color_jitter_only_on_color_modality(dataset_root):
    ds_nj = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "color"],
        color_jitter=None, paired_mode=True,
    )
    ds_j = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "color"],
        color_jitter=ColorJitterConfig(0.5, 0.5, 0.5, 0.3), paired_mode=True,
    )
    a = ds_nj.get(0, random.Random(3))
    b = ds_j.get(0, random.Random(3))
    np.testing.assert_array_equal(a["x"], b["x"])  # depth untouched
    assert not np.array_equal(a["y"], b["y"])  # color jittered


def test_loader_multihost_sharding(dataset_root):
    """shard_index/shard_count slices of the same global order are disjoint
    and together cover every full global batch."""
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=AugmentConfig(out_size=16), paired_mode=True,
    )
    full = DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    shard0 = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        shard_index=0, shard_count=2)
    shard1 = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        shard_index=1, shard_count=2)
    f = list(full)
    s0 = list(shard0)
    s1 = list(shard1)
    # 12 samples -> 3 global batches of 4; partial-free so shards see all 3
    assert len(s0) == len(s1) == 3
    for i in range(3):
        assert s0[i]["x"].shape[0] == s1[i]["x"].shape[0] == 2
        merged = np.concatenate([s0[i]["x"], s1[i]["x"]])
        np.testing.assert_array_equal(merged, f[i]["x"][:4])

    with pytest.raises(ValueError, match="not divisible"):
        DataLoader(ds, batch_size=5, shard_count=2)


def test_loader_early_abandon_no_deadlock(dataset_root):
    """Abandoning the iterator mid-epoch must not deadlock the producer
    (stop-aware put) and must still advance the epoch so the next pass
    reshuffles."""
    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=AugmentConfig(out_size=16), paired_mode=True,
    )
    loader = DataLoader(
        ds, batch_size=2, shuffle=True, seed=11, num_workers=2, prefetch=1
    )
    first = None
    for batch in loader:  # take one batch, abandon the rest
        first = batch["x"]
        break
    assert loader.epoch == 1  # partial pass still advanced the epoch
    # a fresh full pass works and uses the next epoch's shuffle
    batches = list(loader)
    assert len(batches) == 6
    assert not np.array_equal(first, batches[0]["x"])
    # repeated abandonments must not accumulate stuck producers
    for _ in range(5):
        next(iter(loader))
    assert len(list(loader)) == 6


def test_decoded_image_cache(dataset_root, tmp_path):
    """Cache hits bypass decode and return identical pixels; datasets work
    unchanged with the cache attached."""
    from vae_cyclegan_tpu.data import DecodedImageCache, HypersimDataset
    from vae_cyclegan_tpu.data import datasets as ds_mod

    root = dataset_root / "hypersim"
    blob = DecodedImageCache.build(root, tmp_path / "img.cache")
    cache = DecodedImageCache(blob)
    assert len(cache) > 0

    ds = HypersimDataset(str(root), ["depth", "normal"], paired_mode=True)
    plain = ds.get(0, random.Random(5))
    cache.attach()
    try:
        cached = ds.get(0, random.Random(5))
        np.testing.assert_array_equal(plain["x"], cached["x"])
        np.testing.assert_array_equal(plain["y"], cached["y"])
        # every dataset file is a cache hit
        p = ds.samples[0]["modality_paths"]["depth"]
        assert p in cache and cache.get(p).ndim == 3
    finally:
        ds_mod.set_decode_cache(None)


def test_raw_mode_wire_format(dataset_root):
    """raw_mode emits full uint8 frames + (6,) aug vectors with the same
    synchronization semantics as the host path."""
    from vae_cyclegan_tpu.data import AugmentConfig, HypersimDataset

    ds = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=AugmentConfig(out_size=16), paired_mode=True, raw_mode=True,
    )
    item = ds.get(0, random.Random(0))
    assert set(item) == {"x_raw", "x_aug", "y_raw", "y_aug"}
    assert item["x_raw"].dtype == np.uint8 and item["x_raw"].ndim == 3
    assert item["x_aug"].shape == (6,)
    # paired: x and y share the SAME spatial params
    np.testing.assert_array_equal(item["x_aug"], item["y_aug"])

    dsu = HypersimDataset(
        str(dataset_root / "hypersim"), ["depth", "normal"],
        augment=AugmentConfig(out_size=16), paired_mode=False, raw_mode=True,
    )
    it2 = dsu.get(0, random.Random(0))
    assert not np.array_equal(it2["x_aug"], it2["y_aug"])

    with pytest.raises(ValueError, match="color jitter"):
        HypersimDataset(
            str(dataset_root / "hypersim"), ["depth", "color"],
            color_jitter=ColorJitterConfig(), raw_mode=True,
        )


def test_device_aug_matches_host_path(tmp_path):
    """The on-device augmentation of a raw batch reproduces the host path's
    pixels (same rng stream) up to interpolator differences — compared on
    smooth frames where PIL-bicubic vs jax-cubic differences stay small."""
    import jax.numpy as jnp

    from vae_cyclegan_tpu.data import AugmentConfig, HypersimDataset
    from vae_cyclegan_tpu.data.device_aug import augment_batch

    d = tmp_path / "hypersim" / "ai_001_001_indoor" / "cam_00"
    d.mkdir(parents=True)
    xx, yy = np.meshgrid(np.linspace(0, 1, 56), np.linspace(0, 1, 40))
    smooth = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
    for frame in range(2):
        for mod in ("depth", "normal"):
            arr = np.roll(smooth, frame * 7, axis=1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                d / f"frame_{frame:04d}_{mod}.png"
            )

    cfg = AugmentConfig(out_size=16, hflip_p=0.5, vflip_p=0.3)
    common = dict(augment=cfg, paired_mode=True)
    host_ds = HypersimDataset(
        str(tmp_path / "hypersim"), ["depth", "normal"], **common
    )
    raw_ds = HypersimDataset(
        str(tmp_path / "hypersim"), ["depth", "normal"],
        raw_mode=True, **common
    )
    for seed in range(4):
        want = host_ds.get(1, random.Random(seed))
        raw = raw_ds.get(1, random.Random(seed))
        got = augment_batch(
            {k: jnp.asarray(v)[None] for k, v in raw.items()}, 16
        )
        np.testing.assert_allclose(
            np.asarray(got["x"][0]), want["x"], atol=0.08
        )
        np.testing.assert_allclose(
            np.asarray(got["y"][0]), want["y"], atol=0.08
        )
