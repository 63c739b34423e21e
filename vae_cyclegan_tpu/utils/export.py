"""Serialized model export for serving (beyond parity — the reference has
no deployment story beyond re-loading .pth files into Python).

`export_generator` traces a task's generator (the reference's
`model(x)[0]` inference surface, reference test.py:284-314) into a
self-contained `jax.export.Exported`: StableHLO with the trained params
embedded as constants, a seed-scalar serving API (the VAE families sample
their reparameterization noise from it; deterministic families ignore
it), and — by default — a SYMBOLIC batch dimension, so one artifact
serves any batch size. `save`/`load` round-trip the portable serialized
bytes; a loaded artifact runs under `exp.call(...)` on any backend the
export listed (no Python model code, no checkpoint, no framework config
needed at serving time).

Pallas-kernel lowerings are shape-specialized and platform-specific, so
export requires a pure-XLA task (`ModelConfig(use_pallas=False)`); the
CLI (`scripts/export_model.py`) rebuilds the task that way from the run's
args.json.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_generator(
    task,
    state,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Trace + export `task.generate` with params embedded as constants.

    The exported callable's signature is `(x: f32[b, S, S, 3], seed:
    i32[]) -> f32[b, S, S, 3]` with `b` symbolic when `batch_size` is
    None (one artifact, any batch size) and `S = task.mc.image_size`.
    `platforms` lists lowering targets (e.g. ("cpu", "tpu")); default is
    the current backend.
    """
    s = int(task.mc.image_size)

    def serve(x, seed):
        key = jax.random.PRNGKey(seed)
        return task.generate(state, {"x": x, "y": x}, key)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    x_spec = jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(serve), **kwargs)(x_spec, seed_spec)


def save(exported: jax_export.Exported, path: os.PathLike) -> None:
    """Write the portable serialized artifact to `path`."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load(path: os.PathLike) -> jax_export.Exported:
    """Read an artifact written by `save`; run it via `.call(x, seed)`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
