"""Explicit data-parallel (shard_map) plumbing for the train/eval steps.

Round-3 left the Pallas perf path and the multi-chip path as disjoint
configurations: GSPMD cannot partition `pallas_call` (no SPMD rule), so
every multi-device artifact ran kernels-off. The fix is to stop asking
GSPMD to partition the step at all: run the WHOLE train step under
`jax.shard_map` over the 'data' axis. Inside the body every tensor is
shard-local — each pallas_call sees exactly the shapes it was written
for — and the one cross-device fact of data parallelism (the gradient
mean) becomes one explicit `jax.lax.pmean`.

The reference has no analog (strictly single-device, train.py:385); this
is the TPU-native scaling story for its generic train loop
(train.py:80-128).

Mechanics. The sync point lives in `Task._finite_update` (every task's
optimizer gate), so no per-task code changes: when a dp scope is active,
(loss, grads) are pmean'd there before the update, and the engine pmeans
the metrics dict on the way out. The scope is a trace-time contextvar set
by the engine around the shard_map body — tracing is synchronous, so any
retrace re-enters the scope.

Reparameterization noise must stay GLOBALLY positioned: a VAE shard that
draws `normal(key, local_shape)` gets the same values on every device
(the key is replicated), which both correlates the noise across shards
and diverges from the single-device program. `dp_normal` draws the
GLOBAL-batch noise and slices this shard's rows — bitwise identical
values to the unsharded step (and to GSPMD's partitioned threefry,
which computes the same global array), at the cost of each device
generating the full (tiny: latent-sized) noise tensor.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Any, Optional

import jax
import jax.numpy as jnp

_SCOPE: ContextVar[Optional[str]] = ContextVar("vct_dp_axis", default=None)


@contextlib.contextmanager
def dp_scope(axis_name: str = "data"):
    """Mark the dynamic extent of a shard_map body trace. `sync` and
    `dp_normal` become axis-aware inside."""
    token = _SCOPE.set(axis_name)
    try:
        yield
    finally:
        _SCOPE.reset(token)


def dp_axis() -> Optional[str]:
    """The active data-parallel axis name, or None outside a dp scope."""
    return _SCOPE.get()


def sync(tree: Any) -> Any:
    """Cross-shard mean of a pytree (no-op outside a dp scope).

    Per-shard means of equal-sized shards pmean to exactly the global
    batch mean, so every loss/grad/metric in this codebase (all full-batch
    means) is correct under `sync`. NaNs propagate through pmean, so the
    finite-update gate sees a globally consistent predicate.
    """
    axis = _SCOPE.get()
    if axis is None:
        return tree
    return jax.lax.pmean(tree, axis)


_EPS_QUEUE: ContextVar[Optional[list]] = ContextVar("vct_eps_queue",
                                                    default=None)


@contextlib.contextmanager
def eps_queue(items: list):
    """Deterministic-noise injection: while active, `dp_normal` pops
    successive items (in trace order) whose shape matches the request,
    instead of drawing from the key. Items may be TRACERS — wrap the
    jitted step so eps arrive as arguments, giving one compile for a
    whole recorded-noise trajectory (scripts/parity_curves.py pairs the
    torch reference's patched randn_like with this hook)."""
    token = _EPS_QUEUE.set(list(items))
    try:
        yield
    finally:
        _EPS_QUEUE.reset(token)


def dp_normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """`jax.random.normal` that is invariant to data-parallel sharding.

    Outside a dp scope: plain normal(key, shape). Inside: draw the
    global-batch noise normal(key, (B_local * axis_size, ...)) and slice
    rows [i*B_local, (i+1)*B_local) for shard i — the same VALUES the
    single-device program draws for those batch positions.
    """
    q = _EPS_QUEUE.get()
    if q is not None and q and tuple(jnp.shape(q[0])) == tuple(shape):
        return q.pop(0).astype(dtype)
    axis = _SCOPE.get()
    if axis is None:
        return jax.random.normal(key, shape, dtype)
    n = jax.lax.axis_size(axis)  # static (mesh axis extent)
    if n == 1:
        return jax.random.normal(key, shape, dtype)
    gshape = (shape[0] * n, *shape[1:])
    g = jax.random.normal(key, gshape, dtype)
    i = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(g, i * shape[0], shape[0], axis=0)
