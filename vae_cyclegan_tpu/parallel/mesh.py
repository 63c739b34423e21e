"""Data + spatial parallelism over a device mesh.

The reference is strictly single-device (train.py:385; no torch.distributed
anywhere — SURVEY.md §2.2). The TPU-native scaling story: a
`jax.sharding.Mesh` with a 'data' axis (and optionally a 'spatial' axis);
the batch dim is sharded on 'data', the image height dim on 'spatial', and
params/optimizer state are replicated.

Two lowerings consume these meshes (engine.Engine):
  * 1-D 'data' meshes — the PRODUCTION path — run the whole step under
    `jax.shard_map`: tensors inside are shard-local (the Pallas kernels
    run per-device, no GSPMD partitioning rule needed) and the gradient
    all-reduce is one explicit pmean (parallel.dp, Task._finite_update).
  * 2-D (data x spatial) meshes lower through GSPMD jit: the partitioner
    inserts conv halo exchanges (collective-permute) and InstanceNorm/
    loss moment all-reduces over 'spatial' (kernels off by design).
No NCCL analog, no user-visible communication code either way.

Spatial partitioning is this model family's analog of sequence/context
parallelism (there is no attention or sequence axis anywhere — SURVEY §5):
the scaling axis of an image convnet is the spatial extent. It covers the
two regimes pure DP cannot: batches smaller than the mesh (the reference
default --batch_size 5) and resolutions whose activations outgrow one
chip's HBM.

Multi-host growth: call `jax.distributed.initialize()` before `make_mesh()`
on pods; the same code paths apply with devices spanning hosts over DCN
(data-parallel axis only — spatial sharding of a host-local batch across
DCN is not supported).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_warned_replicated_batch = False
_warned_replicated_spatial = False


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    spatial: int = 1,
) -> Mesh:
    """Mesh over the first `n_devices` devices (default: all).

    With `spatial == 1` (default) the mesh is 1-D over `axis_name`. With
    `spatial > 1` it is 2-D ('data', 'spatial'): `n_devices` must be a
    multiple of `spatial`, and the data axis gets `n_devices // spatial`
    devices. Adjacent devices share a spatial group so halo exchanges ride
    neighbor ICI links.

    Raises if fewer devices exist than requested — a silently truncated
    mesh runs "multi-chip" code on one chip and hides sharding bugs.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) are visible; for a virtual "
                f"CPU mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} "
                f"before JAX backend initialization"
            )
        devices = devices[:n_devices]
    if spatial < 1:
        raise ValueError(f"spatial must be >= 1, got {spatial}")
    if spatial == 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % spatial:
        raise ValueError(
            f"spatial axis size {spatial} does not divide the "
            f"{len(devices)}-device mesh"
        )
    grid = np.asarray(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, (axis_name, "spatial"))


def spatial_size(mesh: Mesh) -> int:
    """Size of the mesh's 'spatial' axis (1 when absent)."""
    return mesh.shape.get("spatial", 1)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """NHWC image batch sharding: batch dim split across 'data', height
    dim across 'spatial' (when the mesh has one), W/C replicated."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(axis_name, "spatial"))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)


def shard_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, axis_name: str = "data"
) -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh: batch dim split over 'data',
    image height over 'spatial' (2-D meshes, 4-D NHWC tensors).

    Multi-host: `batch` holds this process's LOCAL slice (the loader's
    shard_index/shard_count slicing); the global array is assembled with
    jax.make_array_from_process_local_data over DCN-spanning shardings.

    Single host: direct device_put. If the batch size does not divide the
    mesh's data axis (the reference default batch is 5), fall back to
    replication over that axis — correctness preserved, parallel speedup
    forfeited for that step — and warn LOUDLY once: an 8-device mesh fed
    non-divisible batches silently runs every chip over the full batch, an
    8x perf cliff. Likewise a height that does not divide the spatial axis
    falls back to spatial replication with its own one-time warning.
    """
    global _warned_replicated_batch, _warned_replicated_spatial
    n = mesh.shape.get(axis_name, 1)
    sp = spatial_size(mesh)
    multihost = jax.process_count() > 1
    if multihost and sp > 1:
        raise NotImplementedError(
            "spatial sharding is single-host (ICI) only; use a pure "
            "data-parallel mesh across hosts"
        )
    out = {}
    for k, v in batch.items():
        if multihost:
            sharding = batch_sharding(mesh, axis_name)
            out[k] = jax.make_array_from_process_local_data(sharding, v)
            continue
        data_ok = v.shape[0] % n == 0
        spatial_ok = sp > 1 and v.ndim >= 2 and v.shape[1] % sp == 0
        if not data_ok and n > 1 and not _warned_replicated_batch:
            _warned_replicated_batch = True
            warnings.warn(
                f"batch dim {v.shape[0]} of '{k}' does not divide the "
                f"{n}-device data axis: the batch is REPLICATED on every "
                f"device and all data parallelism is forfeited. Use "
                f"--batch_size divisible by {n} (e.g. "
                f"{max(n, (v.shape[0] + n - 1) // n * n)}).",
                RuntimeWarning,
                stacklevel=2,
            )
        if sp > 1 and not spatial_ok and not _warned_replicated_spatial:
            _warned_replicated_spatial = True
            warnings.warn(
                f"dim 1 (height) of '{k}' ({v.shape[1] if v.ndim > 1 else 'absent'}) "
                f"does not divide the {sp}-device spatial axis: '{k}' is "
                f"replicated over 'spatial' and spatial parallelism is "
                f"forfeited for it.",
                RuntimeWarning,
                stacklevel=2,
            )
        spec = [None] * v.ndim
        if data_ok:
            spec[0] = axis_name
        if spatial_ok:
            spec[1] = "spatial"
        while spec and spec[-1] is None:  # P('data') == P('data', None)
            spec.pop()
        out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
    return out
