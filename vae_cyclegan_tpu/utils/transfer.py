"""Transfer-learning weight surgery over param pytrees.

Replaces the reference's state-dict key-prefix surgery (utils.py:57-239):
DoubleAE/DoubleVAE pretraining checkpoints initialize the G/F generators of
Cycle models. Flax params are nested dicts, so the surgery is subtree
reassignment:

  DoubleAENet params {encoder, decoder_A, decoder_B}
    -> G = {encoder, decoder: decoder_B}   (A->B uses the target decoder)
    -> F = {encoder, decoder: decoder_A}   (B->A uses the source decoder)

  DoubleVAENet params {encoder, vae_encoder_block_{A,B},
                       vae_decoder_block_{A,B}, decoder_{A,B}}
    -> G = {encoder, variational_encoder_block: ..._B,
            variational_decoder_block: ..._B, decoder: decoder_B}
    -> F = same with the A components.

The sanity asserts (utils.py:205-235: G must hold B components, F must hold
A components) are preserved.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from vae_cyclegan_tpu.models.state import TrainState


def _assert_equal_subtree(a: Any, b: Any, what: str) -> None:
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        if not np.array_equal(np.asarray(la), np.asarray(lb)):
            raise AssertionError(f"{what} mismatch — G and F may be swapped!")


def _copy_tree(tree: Any) -> Any:
    """Fresh buffers per assignment. G and F both receive the shared
    encoder; without copies they would alias the SAME arrays and the jitted
    step's buffer donation would reject the duplicate (torch's
    load_state_dict copies implicitly — reference utils.py:111-117)."""
    return jax.tree_util.tree_map(lambda a: np.array(a, copy=True), tree)


def load_pretrained_doubleae_to_cycle(
    state: TrainState, doubleae_params: Dict[str, Any]
) -> TrainState:
    """DoubleAE {encoder, decoder_A, decoder_B} -> Cycle{AE,AEGAN} G/F
    (utils.py:57-121). `doubleae_params` is the 'model' param tree of a
    DoubleAETask checkpoint. Works on any state whose G/F are plain
    Autoencoders ({encoder, decoder} subtrees)."""
    src = doubleae_params
    for k in ("encoder", "decoder_A", "decoder_B"):
        if k not in src:
            raise KeyError(f"DoubleAE checkpoint missing '{k}' subtree")
    new_params = dict(state.params)
    new_params["G"] = dict(state.params["G"])
    new_params["F"] = dict(state.params["F"])
    new_params["G"]["encoder"] = _copy_tree(src["encoder"])
    new_params["G"]["decoder"] = _copy_tree(src["decoder_B"])
    new_params["F"]["encoder"] = _copy_tree(src["encoder"])
    new_params["F"]["decoder"] = _copy_tree(src["decoder_A"])
    state = state.replace(params=new_params)
    _assert_equal_subtree(state.params["G"]["decoder"], src["decoder_B"], "G.decoder")
    _assert_equal_subtree(state.params["F"]["decoder"], src["decoder_A"], "F.decoder")
    return state


def load_pretrained_doublevae_to_cycle(
    state: TrainState, doublevae_params: Dict[str, Any]
) -> TrainState:
    """DoubleVAE components -> CycleVAE/CycleVAEGAN G/F (utils.py:124-239)."""
    src = doublevae_params
    needed = (
        "encoder",
        "vae_encoder_block_A", "vae_encoder_block_B",
        "vae_decoder_block_A", "vae_decoder_block_B",
        "decoder_A", "decoder_B",
    )
    for k in needed:
        if k not in src:
            raise KeyError(f"DoubleVAE checkpoint missing '{k}' subtree")
    new_params = dict(state.params)
    new_params["G"] = dict(state.params["G"])
    new_params["F"] = dict(state.params["F"])
    new_params["G"]["encoder"] = _copy_tree(src["encoder"])
    new_params["G"]["variational_encoder_block"] = _copy_tree(src["vae_encoder_block_B"])
    new_params["G"]["variational_decoder_block"] = _copy_tree(src["vae_decoder_block_B"])
    new_params["G"]["decoder"] = _copy_tree(src["decoder_B"])
    new_params["F"]["encoder"] = _copy_tree(src["encoder"])
    new_params["F"]["variational_encoder_block"] = _copy_tree(src["vae_encoder_block_A"])
    new_params["F"]["variational_decoder_block"] = _copy_tree(src["vae_decoder_block_A"])
    new_params["F"]["decoder"] = _copy_tree(src["decoder_A"])
    state = state.replace(params=new_params)
    # Sanity checks per utils.py:205-235
    _assert_equal_subtree(state.params["G"]["decoder"], src["decoder_B"], "G.decoder")
    _assert_equal_subtree(state.params["F"]["decoder"], src["decoder_A"], "F.decoder")
    _assert_equal_subtree(
        state.params["G"]["variational_decoder_block"],
        src["vae_decoder_block_B"],
        "G.variational_decoder_block",
    )
    _assert_equal_subtree(
        state.params["F"]["variational_decoder_block"],
        src["vae_decoder_block_A"],
        "F.variational_decoder_block",
    )
    return state
