"""NaN/Inf diagnostic dumps.

The reference's NaN guard prints every parameter and gradient to the console
when a non-finite loss appears, then skips the optimizer step (reference
Networks.py:356-372). Under jit that observability must be a host callback:
when enabled, the skip branch of the finite-update cond fires a
jax.debug.callback that writes the offending loss, batch, params and grads
as an .npz into the configured run directory. Healthy steps pay nothing —
the callback lives only on the non-finite branch of the lax.cond, and no
callback is traced at all while dumping is disabled.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Any, Optional

_lock = threading.Lock()
_dump_dir: Optional[Path] = None
_max_dumps = 3
_dump_count = 0


def enable(run_dir, max_dumps: int = 3) -> None:
    """Route NaN dumps to `run_dir`/nan_dumps. Call BEFORE the train step is
    traced (the callback is baked in at trace time)."""
    global _dump_dir, _max_dumps, _dump_count
    _dump_dir = Path(run_dir) / "nan_dumps"
    _max_dumps = max_dumps
    _dump_count = 0


def disable() -> None:
    global _dump_dir
    _dump_dir = None


def enabled() -> bool:
    return _dump_dir is not None


def backend_supports_callbacks() -> bool:
    """Probe whether the active JAX backend executes host callbacks (some
    tunneled PJRT plugins reject send/recv callbacks outright)."""
    import jax
    import jax.numpy as jnp

    try:
        def probe(x):
            jax.debug.callback(lambda v: None, x)
            return x + 1

        jax.jit(probe)(jnp.zeros(())).block_until_ready()
        return True
    except Exception:  # noqa: BLE001 — any failure means "unsupported"
        return False


def _flatten(tree: Any, prefix: str) -> dict:
    import jax
    import numpy as np

    return {
        f"{prefix}{jax.tree_util.keystr(path)}": np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def write_dump(loss, batch, params, grads) -> None:
    """Host-side sink for jax.debug.callback (values arrive as numpy)."""
    global _dump_count
    import numpy as np

    with _lock:
        if _dump_dir is None or _dump_count >= _max_dumps:
            return
        _dump_count += 1
        n = _dump_count
    os.makedirs(_dump_dir, exist_ok=True)
    payload = {"loss": np.asarray(loss)}
    payload.update(_flatten(batch or {}, "batch"))
    payload.update(_flatten(params, "params"))
    payload.update(_flatten(grads, "grads"))
    path = _dump_dir / f"nan_dump_{n:02d}.npz"
    np.savez_compressed(path, **payload)
    print(f"NaN/Inf detected in loss; diagnostic dump written to {path}")
