"""Data parallelism over a 1-D device mesh.

The reference is strictly single-device (train.py:385; no torch.distributed
anywhere — SURVEY.md §2.2). The TPU-native scaling story: a
`jax.sharding.Mesh` over the 'data' axis; the batch is sharded on 'data',
params/optimizer state are replicated, and the SPMD partitioner emits the
gradient all-reduce over ICI inside the single jitted train step — no NCCL
analog, no user-visible communication code.

Multi-host growth: call `jax.distributed.initialize()` before `make_mesh()`
on pods; the same code paths apply with devices spanning hosts over DCN.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_warned_replicated_batch = False


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all).

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
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading (batch) dim split across the mesh, rest replicated."""
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
    """Place a host batch onto the mesh, batch dim split over 'data'.

    Multi-host: `batch` holds this process's LOCAL slice (the loader's
    shard_index/shard_count slicing); the global array is assembled with
    jax.make_array_from_process_local_data over DCN-spanning shardings.

    Single host: direct device_put. If the batch size does not divide the
    mesh (the reference default batch is 5), fall back to replication —
    correctness preserved, parallel speedup forfeited for that step — and
    warn LOUDLY once: an 8-device mesh fed non-divisible batches silently
    runs every chip over the full batch, an 8x perf cliff.
    """
    global _warned_replicated_batch
    n = mesh.devices.size
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if multihost:
            sharding = batch_sharding(mesh, axis_name)
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        elif v.shape[0] % n == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, axis_name))
        else:
            if not _warned_replicated_batch and n > 1:
                _warned_replicated_batch = True
                warnings.warn(
                    f"batch dim {v.shape[0]} of '{k}' does not divide the "
                    f"{n}-device mesh: the batch is REPLICATED on every "
                    f"device and all data parallelism is forfeited. Use "
                    f"--batch_size divisible by {n} (e.g. "
                    f"{max(n, (v.shape[0] + n - 1) // n * n)}).",
                    RuntimeWarning,
                    stacklevel=2,
                )
            out[k] = jax.device_put(v, replicated_sharding(mesh))
    return out
