"""Frechet Inception Distance (beyond-parity quality metric).

The reference repo has no quantitative quality metric at all (its test.py
emits comparison figures only, reference test.py:317-604); SSIM/PSNR were
added in round 2 and FID closes the set. Three pieces:

  * `frechet_distance` — the closed-form 2-Wasserstein distance between
    Gaussians, pure numpy (eigendecomposition matrix sqrt, no scipy).
  * `InceptionV3` — the torchvision-architecture Inception v3 feature
    trunk (through the global-average pool, 2048-d), implemented in
    Flax/NHWC. Matches the layer graph used by the standard pytorch-fid
    scoring so imported torchvision weights reproduce standard FID.
  * `load_torch_inception` — maps a torchvision `inception_v3` state_dict
    (`.pth`, loaded with torch on CPU) onto the Flax params. Weights are
    NOT bundled (this environment has no network egress and torchvision
    is not installed); pass any torchvision-format checkpoint, e.g.
    `inception_v3_google-0cc3c7bd.pth`.

Everything is usable with an arbitrary feature extractor too — the eval
driver only needs `fid_from_features`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Frechet distance (pure numpy)
# ---------------------------------------------------------------------------


def activation_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, covariance)."""
    f = np.asarray(feats, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh."""
    w, v = np.linalg.eigh((a + a.T) / 2.0)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T

def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + tr(s1 + s2 - 2 (s1 s2)^(1/2)).

    tr((s1 s2)^(1/2)) is computed as tr((s1^(1/2) s2 s1^(1/2))^(1/2)) —
    the inner matrix is symmetric PSD, so eigh is stable (no scipy
    sqrtm of a non-symmetric product).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2
    r1 = _sqrtm_psd(sigma1)
    inner = r1 @ sigma2 @ r1
    w = np.clip(np.linalg.eigvalsh((inner + inner.T) / 2.0), 0.0, None)
    tr_sqrt = float(np.sqrt(w).sum())
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_sqrt)


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu_a, s_a = activation_stats(feats_a)
    mu_b, s_b = activation_stats(feats_b)
    return frechet_distance(mu_a, s_a, mu_b, s_b)


# ---------------------------------------------------------------------------
# Inception v3 feature trunk (torchvision graph, NHWC Flax)
# ---------------------------------------------------------------------------


class BasicConv(nn.Module):
    """Conv (no bias) + BatchNorm(eps 1e-3, inference) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avgpool3(x):
    # torch avg_pool2d(k=3, s=1, p=1, count_include_pad=False)
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=False)
    return s


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1),
                       name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature trunk: (N, 299, 299, 3) in [0, 1] -> (N, 2048) pool
    features. Input is rescaled to [-1, 1] inside (pytorch-fid
    convention)."""

    @nn.compact
    def __call__(self, x):
        x = x * 2.0 - 1.0
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision weight import
# ---------------------------------------------------------------------------


def load_torch_inception(path: str) -> Dict[str, Any]:
    """Map a torchvision `inception_v3` state_dict (.pth) onto
    InceptionV3 variables {'params', 'batch_stats'}.

    Accepts both the torchvision checkpoint (keys like
    `Mixed_5b.branch1x1.conv.weight`) and a plain dict of numpy arrays
    with the same keys (e.g. re-saved via np.savez). The aux-logits and
    fc heads are ignored.
    """
    sd = _load_state_dict(path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, dotted, leaf, val):
        node = tree
        for part in dotted:
            node = node.setdefault(part, {})
        node[leaf] = val

    for key, val in sd.items():
        if key.startswith(("fc.", "AuxLogits.")):
            continue
        v = np.asarray(val)
        parts = key.split(".")
        leaf = parts[-1]          # weight / bias / running_mean / ...
        kind = parts[-2]          # conv / bn
        scope = parts[:-2]        # e.g. ['Mixed_5b', 'branch1x1']
        if kind == "conv" and leaf == "weight":
            put(params, scope + ["conv"], "kernel",
                v.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "bn" and leaf == "weight":
            put(params, scope + ["bn"], "scale", v)
        elif kind == "bn" and leaf == "bias":
            put(params, scope + ["bn"], "bias", v)
        elif kind == "bn" and leaf == "running_mean":
            put(stats, scope + ["bn"], "mean", v)
        elif kind == "bn" and leaf == "running_var":
            put(stats, scope + ["bn"], "var", v)
        # num_batches_tracked: ignored

    return {"params": params, "batch_stats": stats}


def _load_state_dict(path: str):
    if str(path).endswith((".npz", ".npy")):
        return dict(np.load(path, allow_pickle=True))
    import torch  # local import: torch is CPU-only in this image

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# end-to-end scoring
# ---------------------------------------------------------------------------


def make_feature_fn(variables: Dict[str, Any]) -> Callable:
    """Returns a jitted fn: (N, H, W, 3) float in [0,1] -> (N, 2048)."""
    model = InceptionV3()

    @jax.jit
    def feats(x):
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
        )
        return model.apply(variables, x)

    return feats


def fid_score(
    images_a: Sequence[np.ndarray],
    images_b: Sequence[np.ndarray],
    feature_fn: Callable,
    batch_size: int = 8,
) -> float:
    """FID between two image sets ((H,W,3) float arrays in [0,1])."""

    def run(images):
        out = []
        buf = [np.asarray(im, np.float32) for im in images]
        for i in range(0, len(buf), batch_size):
            chunk = np.stack(buf[i : i + batch_size])
            out.append(np.asarray(feature_fn(jnp.asarray(chunk))))
        return np.concatenate(out, axis=0)

    return fid_from_features(run(images_a), run(images_b))
