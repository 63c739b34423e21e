"""Spectral normalization by power iteration, as functional state.

The reference wraps only the discriminator's final conv in
``torch.nn.utils.spectral_norm`` (reference: Networks.py:248). Torch mutates
the power-iteration vectors (u, v) in-place on every training forward; under
``jit`` that state must be explicit, so the discriminator carries (u, v) in a
dedicated Flax variable collection and each training call performs exactly
one power iteration (matching torch's ``n_power_iterations=1``), with the
updated vectors threaded through the step in the reference's call order
(SURVEY.md "Spectral norm under jit").

Semantics per torch:
  * train forward: v <- normalize(W^T u); u <- normalize(W v);
    sigma = u . (W v) with u, v detached; weight_used = W / sigma.
  * eval forward: no update; sigma computed from the stored u, v.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2_normalize(x: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + eps)


def spectral_normalize(
    w: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    update: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (w / sigma, new_u, new_v).

    Args:
      w: conv kernel (kh, kw, cin, cout); flattened to (cout, kh*kw*cin).
        (Sigma is invariant to the column permutation vs torch's layout.)
      u: (cout,) left singular vector estimate.
      v: (kh*kw*cin,) right singular vector estimate.
      update: run one power iteration (training) or reuse stored vectors.
    """
    cout = w.shape[-1]
    w_mat = w.reshape(-1, cout).T.astype(jnp.float32)  # (cout, N)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if update:
        vf = _l2_normalize(w_mat.T @ uf)
        uf = _l2_normalize(w_mat @ vf)
        uf = jax.lax.stop_gradient(uf)
        vf = jax.lax.stop_gradient(vf)
    sigma = uf @ (w_mat @ vf)
    w_sn = (w.astype(jnp.float32) / sigma).astype(w.dtype)
    return w_sn, uf.astype(u.dtype), vf.astype(v.dtype)
