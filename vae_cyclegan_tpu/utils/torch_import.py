"""Import reference PyTorch checkpoints into this framework's param trees.

The reference stores raw torch ``state_dict``s in its .pth checkpoints
(reference utils.py:17-28). This module maps those key layouts onto our Flax
param trees so users can migrate existing reference runs. It consumes plain
{key: numpy array} dicts, so torch is only needed by whoever loads the .pth.

Layout conversions:
  * conv weight (O, I, kH, kW)  ->  Flax kernel (kH, kW, I, O)
  * PixelShuffle/Unshuffle channel groups are (c, s1, s2) in both (see
    ops/pixel_shuffle.py), so channel orders line up with no permutation.
  * spectral_norm 'weight_v' is flattened over torch's (I, kH, kW); ours is
    flattened over (kH, kW, I) — permuted accordingly.

Key maps follow Networks.py module registration order:
  Encoder   = model.0 CaSb, model.1-4 D, model.5 R      (Networks.py:154-164)
  Decoder   = model.0 R, model.1-4 U, model.5 CaSb      (Networks.py:183-193)
  VarEnc    = muConv L, logvarConv S,S                  (Networks.py:214-218)
  VarDec    = conv S                                    (Networks.py:230-237)
  Discrim   = model.0-3 CaSb, model.4 spectral conv     (Networks.py:240-250)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return {"Conv_0": out}


def encoder_params(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    p = prefix
    return {
        "CaSb_0": {"ReflectConv_0": _conv(sd, f"{p}model.0.conv")},
        "DBlock_0": {"ReflectConv_0": _conv(sd, f"{p}model.1.conv")},
        "DBlock_1": {"ReflectConv_0": _conv(sd, f"{p}model.2.conv")},
        "DBlock_2": {"ReflectConv_0": _conv(sd, f"{p}model.3.conv")},
        "DBlock_3": {"ReflectConv_0": _conv(sd, f"{p}model.4.conv")},
        "RBlock_0": {
            "ReflectConv_0": _conv(sd, f"{p}model.5.conv1"),
            "ReflectConv_1": _conv(sd, f"{p}model.5.conv2"),
        },
    }


def decoder_params(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    p = prefix
    return {
        "RBlock_0": {
            "ReflectConv_0": _conv(sd, f"{p}model.0.conv1"),
            "ReflectConv_1": _conv(sd, f"{p}model.0.conv2"),
        },
        "UBlock_0": {"ReflectConv_0": _conv(sd, f"{p}model.1.conv")},
        "UBlock_1": {"ReflectConv_0": _conv(sd, f"{p}model.2.conv")},
        "UBlock_2": {"ReflectConv_0": _conv(sd, f"{p}model.3.conv")},
        "UBlock_3": {"ReflectConv_0": _conv(sd, f"{p}model.4.conv")},
        "CaSb_0": {"ReflectConv_0": _conv(sd, f"{p}model.5.conv")},
    }


def var_encoder_block_params(sd, prefix: str = "") -> Dict:
    p = prefix
    return {
        "LConv_0": {"ReflectConv_0": _conv(sd, f"{p}muConv.conv")},
        "SConv_0": {"ReflectConv_0": _conv(sd, f"{p}logvarConv.0.conv")},
        "SConv_1": {"ReflectConv_0": _conv(sd, f"{p}logvarConv.1.conv")},
    }


def var_decoder_block_params(sd, prefix: str = "") -> Dict:
    return {"SConv_0": {"ReflectConv_0": _conv(sd, f"{prefix}conv.conv")}}


def autoencoder_params(sd, prefix: str = "") -> Dict:
    return {
        "encoder": encoder_params(sd, f"{prefix}encoder."),
        "decoder": decoder_params(sd, f"{prefix}decoder."),
    }


def vae_params(sd, prefix: str = "") -> Dict:
    return {
        "encoder": encoder_params(sd, f"{prefix}encoder."),
        "variational_encoder_block": var_encoder_block_params(
            sd, f"{prefix}variational_encoder_block."
        ),
        "variational_decoder_block": var_decoder_block_params(
            sd, f"{prefix}variational_decoder_block."
        ),
        "decoder": decoder_params(sd, f"{prefix}decoder."),
    }


def discriminator_params(
    sd, prefix: str = ""
) -> Tuple[Dict, Dict]:
    """Returns (params, spectral) collections."""
    p = prefix
    w_orig = np.asarray(sd[f"{p}model.4.weight_orig"])  # (O, I, kH, kW)
    o, i, kh, kw = w_orig.shape
    u = np.asarray(sd[f"{p}model.4.weight_u"])  # (O,)
    v_t = np.asarray(sd[f"{p}model.4.weight_v"])  # (I*kH*kW,) over (I,kH,kW)
    v = np.transpose(v_t.reshape(i, kh, kw), (1, 2, 0)).reshape(-1)
    params = {
        "CaSb_0": {"ReflectConv_0": _conv(sd, f"{p}model.0.conv")},
        "CaSb_1": {"ReflectConv_0": _conv(sd, f"{p}model.1.conv")},
        "CaSb_2": {"ReflectConv_0": _conv(sd, f"{p}model.2.conv")},
        "CaSb_3": {"ReflectConv_0": _conv(sd, f"{p}model.3.conv")},
        "SpectralConv_0": {
            "kernel": np.transpose(w_orig, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{p}model.4.bias"]),
        },
    }
    spectral = {"SpectralConv_0": {"u": u, "v": v}}
    return params, spectral


def import_reference_state_dict(architecture: str, sd: Dict[str, np.ndarray]):
    """Map a reference composite state_dict onto (params, spectral) dicts
    matching our TrainState layout for `architecture`."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if architecture == "autoencoder":
        return {"model": autoencoder_params(sd)}, {}
    if architecture == "vae":
        return {"model": vae_params(sd)}, {}
    if architecture == "doubleae":
        return {
            "model": {
                "encoder": encoder_params(sd, "encoder."),
                "decoder_A": decoder_params(sd, "decoder_A."),
                "decoder_B": decoder_params(sd, "decoder_B."),
            }
        }, {}
    if architecture == "doublevae":
        return {
            "model": {
                "encoder": encoder_params(sd, "encoder."),
                "vae_encoder_block_A": var_encoder_block_params(
                    sd, "vae_encoder_block_A."
                ),
                "vae_encoder_block_B": var_encoder_block_params(
                    sd, "vae_encoder_block_B."
                ),
                "vae_decoder_block_A": var_decoder_block_params(
                    sd, "vae_decoder_block_A."
                ),
                "vae_decoder_block_B": var_decoder_block_params(
                    sd, "vae_decoder_block_B."
                ),
                "decoder_A": decoder_params(sd, "decoder_A."),
                "decoder_B": decoder_params(sd, "decoder_B."),
            }
        }, {}
    if architecture in ("aegan", "vaegan"):
        gen = (
            autoencoder_params(sd, "G.")
            if architecture == "aegan"
            else vae_params(sd, "G.")
        )
        d_params, d_spec = discriminator_params(sd, "D.")
        return {"G": gen, "D": d_params}, {"D": d_spec}
    if architecture in ("cycleae", "cyclevae"):
        gen = autoencoder_params if architecture == "cycleae" else vae_params
        return {"G": gen(sd, "G."), "F": gen(sd, "F.")}, {}
    if architecture in ("cycleaegan", "cyclevaegan"):
        gen = autoencoder_params if architecture == "cycleaegan" else vae_params
        dx_params, dx_spec = discriminator_params(sd, "DX.")
        dy_params, dy_spec = discriminator_params(sd, "DY.")
        return (
            {
                "G": gen(sd, "G."),
                "F": gen(sd, "F."),
                "DX": dx_params,
                "DY": dy_params,
            },
            {"DX": dx_spec, "DY": dy_spec},
        )
    raise ValueError(f"Unknown architecture: {architecture}")


def load_into_state(state: Any, architecture: str, sd: Dict[str, np.ndarray]):
    """Replace a TrainState's params/spectral with imported reference
    weights (shapes validated against the existing tree)."""
    import jax

    params, spectral = import_reference_state_dict(architecture, sd)

    def _check(tmpl, new, name):
        t_leaves = jax.tree_util.tree_leaves_with_path(tmpl)
        n_flat = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(new)
        }
        if len(t_leaves) != len(n_flat):
            raise ValueError(
                f"{name}: leaf count mismatch {len(t_leaves)} vs {len(n_flat)}"
            )
        out = {}
        for p, leaf in t_leaves:
            key = jax.tree_util.keystr(p)
            if key not in n_flat:
                raise KeyError(f"{name}: missing {key} in imported weights")
            if tuple(n_flat[key].shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{name}{key}: shape {n_flat[key].shape} != {leaf.shape}"
                )
        return new

    _check(state.params, params, "params")
    if state.spectral:
        _check(state.spectral, spectral, "spectral")
    # copy=True: torch `.detach().numpy()` views share storage with the live
    # torch tensors — without a copy, a subsequent torch optimizer.step()
    # would silently mutate these params.
    params = jax.tree_util.tree_map(
        lambda t, n: np.array(n, dtype=t.dtype, copy=True), state.params, params
    )
    spectral = jax.tree_util.tree_map(
        lambda t, n: np.array(n, dtype=t.dtype, copy=True),
        state.spectral, spectral,
    ) if state.spectral else {}
    return state.replace(params=params, spectral=spectral)


# ---------------------------------------------------------------------------
# optimizer-state import: torch Adam moments -> optax ScaleByAdamState trees
#
# The reference checkpoints carry per-model Adam states via
# save_optimizer_states (e.g. Networks.py:1938-1947); importing them lets a
# reference run resume here with momentum intact instead of fresh moments.

# torch optimizer construction order per architecture (reference
# configure_optimizers): prefixes are concatenated in constructor-argument
# order; "" = self.parameters() (module registration order).
_OPTIMIZER_PREFIXES = {
    "autoencoder": {"optimizer": ("",)},
    "vae": {"optimizer": ("",)},
    "doubleae": {"optimizer": ("",)},
    "doublevae": {"optimizer": ("",)},
    "cycleae": {"optimizer": ("",)},
    "cyclevae": {"optimizer": ("",)},
    "aegan": {"optimizer_G": ("G.",), "optimizer_D": ("D.",)},
    "vaegan": {"optimizer_G": ("G.",), "optimizer_D": ("D.",)},
    # Networks.py:1667-1677 / 1926-1936: Adam(list(F)+list(G)), Adam(DX+DY)
    "cycleaegan": {"optimizer_G": ("F.", "G."), "optimizer_D": ("DX.", "DY.")},
    "cyclevaegan": {"optimizer_G": ("F.", "G."), "optimizer_D": ("DX.", "DY.")},
}

# our TrainState.opt_state key per torch optimizer key
_OPT_KEY_MAP = {"optimizer": "model", "optimizer_G": "G", "optimizer_D": "D"}

_SPECTRAL_BUFFERS = ("weight_u", "weight_v")


def _param_names(sd: Dict[str, np.ndarray], prefix: str) -> list:
    """Parameter names under `prefix` in state_dict order. torch emits a
    module's parameters before its buffers and recurses children in
    registration order, so dropping the spectral (u, v) buffers leaves
    exactly named_parameters() order — the order Adam indexes by."""
    return [
        k for k in sd
        if k.startswith(prefix) and not k.endswith(_SPECTRAL_BUFFERS)
    ]


def import_adam_moments(
    architecture: str,
    sd: Dict[str, np.ndarray],
    opt_states: Dict[str, dict],
) -> Dict[str, Tuple[Dict, Dict, int]]:
    """Map reference save_optimizer_states() output onto param-tree-shaped
    moment trees.

    Returns {our_opt_key: (mu_tree, nu_tree, count)} where mu/nu trees have
    the same structure as the corresponding import_reference_state_dict
    param subtrees ('model' / 'G' / 'D'; the 'G'/'D' entries of cycle-GAN
    archs hold {'F','G'} / {'DX','DY'} pairs).
    """
    prefixes = _OPTIMIZER_PREFIXES.get(architecture)
    if prefixes is None:
        raise ValueError(f"Unknown architecture: {architecture}")

    # per-moment state_dict clones with moment tensors in place of weights
    out: Dict[str, Tuple[Dict, Dict, int]] = {}
    moment_sds = {"exp_avg": {}, "exp_avg_sq": {}}
    counts: Dict[str, int] = {}
    for torch_key, prefix_seq in prefixes.items():
        osd = opt_states[torch_key]
        ids = list(osd["param_groups"][0]["params"])
        names = [n for p in prefix_seq for n in _param_names(sd, p)]
        if architecture == "autoencoder" and len(ids) != len(names):
            names = _param_names(sd, "decoder.")  # decoder_only optimizer
        if len(ids) != len(names):
            raise ValueError(
                f"{torch_key}: {len(ids)} optimizer slots vs "
                f"{len(names)} parameters"
            )
        count = 0
        for i, name in zip(ids, names):
            st = osd["state"][i]
            moment_sds["exp_avg"][name] = np.asarray(st["exp_avg"])
            moment_sds["exp_avg_sq"][name] = np.asarray(st["exp_avg_sq"])
            count = int(st.get("step", 0))
        counts[torch_key] = count

    trees = {}
    for which, msd in moment_sds.items():
        # dummy spectral buffers so the shared param mapper can run
        for k in sd:
            if k.endswith(_SPECTRAL_BUFFERS):
                msd[k] = np.asarray(sd[k])
        trees[which], _ = import_reference_state_dict(architecture, msd)

    for torch_key in prefixes:
        our_key = _OPT_KEY_MAP[torch_key]
        mu_tree = dict(trees["exp_avg"])
        nu_tree = dict(trees["exp_avg_sq"])
        if our_key == "model":
            mu, nu = mu_tree["model"], nu_tree["model"]
            if architecture in ("cycleae", "cyclevae"):
                mu = {"G": mu_tree["G"], "F": mu_tree["F"]}
                nu = {"G": nu_tree["G"], "F": nu_tree["F"]}
        elif our_key == "G" and architecture in ("cycleaegan", "cyclevaegan"):
            mu = {"G": mu_tree["G"], "F": mu_tree["F"]}
            nu = {"G": nu_tree["G"], "F": nu_tree["F"]}
        elif our_key == "D" and architecture in ("cycleaegan", "cyclevaegan"):
            mu = {"DX": mu_tree["DX"], "DY": mu_tree["DY"]}
            nu = {"DX": nu_tree["DX"], "DY": nu_tree["DY"]}
        else:
            mu, nu = mu_tree[our_key], nu_tree[our_key]
        out[our_key] = (mu, nu, counts[torch_key])
    return out


def load_adam_moments_into_state(
    state: Any,
    architecture: str,
    sd: Dict[str, np.ndarray],
    opt_states: Dict[str, dict],
):
    """Replace the Adam first/second moments and step counts in a
    TrainState's optax opt_state with moments imported from the reference's
    save_optimizer_states() dict."""
    import jax
    import jax.numpy as jnp

    moments = import_adam_moments(architecture, sd, opt_states)
    new_opt_state = {}
    for key, entry in state.opt_state.items():
        if key not in moments:
            raise KeyError(f"no imported moments for opt_state[{key!r}]")
        mu, nu, count = moments[key]
        adam = entry[0]  # optax.adam = chain(scale_by_adam, scale)
        cast = lambda t, n: np.array(n, dtype=t.dtype, copy=True)  # noqa: E731
        new_adam = adam._replace(
            count=jnp.asarray(count, adam.count.dtype),
            mu=jax.tree_util.tree_map(cast, adam.mu, mu),
            nu=jax.tree_util.tree_map(cast, adam.nu, nu),
        )
        new_opt_state[key] = (new_adam,) + tuple(entry[1:])
    return state.replace(opt_state=new_opt_state)
