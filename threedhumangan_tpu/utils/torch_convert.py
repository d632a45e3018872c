"""Convert the reference's torch EMA state_dict into our parameter pytree.

The released checkpoint (map3dbn512l, step 295k) is a torch ``state_dict``
of ``Map3DGenerator`` (loaded via the dict branch at reference
apps/sample_from_generator.py:109-111 — that branch defines the key space).
This module maps those keys onto the TPU build's pytrees:

  torch Linear  weight (out, in)        -> ours (in, out)      [transpose]
  torch Conv1x1 weight (out, in, 1, 1)  -> ours (in, out)
  torch Conv3x3 weight (out, in, kh, kw)-> ours HWIO (kh, kw, in, out)
  spectral_norm weight_orig/_u          -> params w + state u
  SyncBatchNorm running stats           -> norm state {mean, var, count}

Checkpoint conversion is SURVEY.md §7 step 9.  Numeric validation (no
released asset needed): tests/test_reference_parity.py::
test_full_generator_forward_parity routes the imported reference torch
generator's state_dict through this converter and asserts output parity of
the COMPLETE forward, and tests/test_torch_convert.py pins the
spectral-norm (weight_orig/weight_u) and BN running-stat mappings against
torch oracles output-for-output, plus shape coverage of every leaf.
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _lin(sd, prefix):
    return {
        "w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T),
        "b": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
    }


def _conv1x1(sd, prefix, spectral=False):
    wkey = prefix + (".weight_orig" if spectral and prefix + ".weight_orig" in sd else ".weight")
    w = np.asarray(sd[wkey])  # (out, in, 1, 1) or (out, in)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}


def _sn_state(sd, prefix, out_dim):
    ukey = prefix + ".weight_u"
    if ukey in sd:
        return {"u": jnp.asarray(np.asarray(sd[ukey]))}
    u = np.random.RandomState(0).randn(out_dim).astype(np.float32)
    return {"u": jnp.asarray(u / np.linalg.norm(u))}


def _fc_equalized(sd, prefix, lr_multiplier=0.01, extra_gain=1.0):
    """FullyConnectedLayer: weight stays (out, in) raw; gains recomputed."""
    w = np.asarray(sd[prefix + ".weight"])
    fan_in = w.shape[1]
    return {
        "w": jnp.asarray(w),
        "b": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
        "w_gain": jnp.asarray(lr_multiplier / np.sqrt(fan_in) * extra_gain, jnp.float32),
        "b_gain": jnp.asarray(lr_multiplier, jnp.float32),
    }


def convert_generator_state_dict(sd: Dict[str, np.ndarray], meta: Dict) -> Tuple[Dict, Dict]:
    """Map a reference Map3DGenerator state_dict -> (params, state)."""
    params: Dict = {}
    state: Dict = {}

    # --- neural field (COORDCONCATSIREN key space) ---
    nf = {
        "first_coord": _lin(sd, "neural_field.first_layer_coord.layer"),
        "first_mod": _lin(sd, "neural_field.first_layer_mod.layer"),
        "network": [],
        "sigma": _lin(sd, "neural_field.sigma_layer"),
        "color_sine": _lin(sd, "neural_field.color_layer_sine.layer"),
        "color_linear": _lin(sd, "neural_field.color_layer_linear"),
        "feature_linear": _lin(sd, "neural_field.feature_layer_linear"),
    }
    i = 0
    while f"neural_field.network.{i}.layer.weight" in sd:
        nf["network"].append(_lin(sd, f"neural_field.network.{i}.layer"))
        i += 1
    params["neural_field"] = nf

    # --- synthesis input heads ---
    params["synthesis_input"] = {"first": _conv1x1(sd, "synthesis_input.network.0"), "rest": []}

    ssi = {"from_coords": _conv1x1(sd, "synthesis_style_input.from_coords.0"), "network": []}
    j = 0
    while f"synthesis_style_input.network.{j}.weight" in sd:
        ssi["network"].append(_conv1x1(sd, f"synthesis_style_input.network.{j}"))
        j += 2  # Sequential interleaves activations
    params["synthesis_style_input"] = ssi

    # --- synthesis network (SPADE blocks) ---
    blocks, to_rgbs, block_states = [], [], []
    b = 0
    while f"synthesis_network.network.m3d_{b}.conv_0.bias" in sd or \
          f"synthesis_network.network.m3d_{b}.conv_0.weight_orig" in sd:
        pre = f"synthesis_network.network.m3d_{b}"
        bp = {
            "conv_0": _conv1x1(sd, pre + ".conv_0", spectral=True),
            "conv_1": _conv1x1(sd, pre + ".conv_1", spectral=True),
        }
        bs = {
            "conv_0": _sn_state(sd, pre + ".conv_0", bp["conv_0"]["w"].shape[1]),
            "conv_1": _sn_state(sd, pre + ".conv_1", bp["conv_1"]["w"].shape[1]),
        }
        for s_idx in (0, 1):
            sp = f"{pre}.spade_{s_idx}"
            spade_p = {
                "mlp_shared": _conv1x1(sd, sp + ".mlp_shared.0"),
                "mlp_gamma": _conv1x1(sd, sp + ".mlp_gamma"),
                "mlp_beta": _conv1x1(sd, sp + ".mlp_beta"),
            }
            spade_s = {}
            if sp + ".first_norm.running_mean" in sd:
                mean = np.asarray(sd[sp + ".first_norm.running_mean"])
                var = np.asarray(sd[sp + ".first_norm.running_var"])
                count = np.asarray(sd.get(sp + ".first_norm.num_batches_tracked", 0))
                spade_s["norm"] = {
                    "mean": jnp.asarray(mean),
                    "var": jnp.asarray(var),
                    "count": jnp.asarray(count, jnp.int32),
                }
                if sp + ".first_norm.weight" in sd:  # SyncBatchNorm affine
                    spade_p["norm"] = {
                        "scale": jnp.asarray(np.asarray(sd[sp + ".first_norm.weight"])),
                        "bias": jnp.asarray(np.asarray(sd[sp + ".first_norm.bias"])),
                    }
            bp[f"spade_{s_idx}"] = spade_p
            bs[f"spade_{s_idx}"] = spade_s
        blocks.append(bp)
        block_states.append(bs)
        to_rgbs.append(_conv1x1(sd, f"synthesis_network.to_rgbs.m3d_{b}.linear"))
        b += 1
    params["synthesis_network"] = {"blocks": blocks, "to_rgbs": to_rgbs}
    state["synthesis_network"] = {"blocks": block_states}

    # --- mapping networks ---
    nm = {"layers": []}
    for li in (0, 2, 4, 6):
        nm["layers"].append(_lin(sd, f"neural_field_mapping_network.network.{li}"))
    params["neural_field_mapping_network"] = nm

    tpm = {"trunk": [], "implicit": [], "superres": []}
    t = 0
    while f"synthesis_mapping_network.trunk{t}.weight" in sd:
        tpm["trunk"].append(_fc_equalized(sd, f"synthesis_mapping_network.trunk{t}"))
        t += 1
    br = 0
    while f"synthesis_mapping_network.implicit{br}.weight" in sd:
        # last implicit layer carries the extra 0.2 weight gain (ref :175)
        is_last = f"synthesis_mapping_network.implicit{br + 1}.weight" not in sd
        tpm["implicit"].append(_fc_equalized(
            sd, f"synthesis_mapping_network.implicit{br}",
            extra_gain=0.2 if is_last else 1.0))
        tpm["superres"].append(_fc_equalized(sd, f"synthesis_mapping_network.superres{br}"))
        br += 1
    params["synthesis_mapping_network"] = tpm

    # --- latent pool ---
    if "latent_pool.latents" in sd:
        params["latent_pool"] = jnp.asarray(np.asarray(sd["latent_pool.latents"]))
    else:
        params["latent_pool"] = jnp.zeros((meta["dataset_length"], meta["latent_dim"]))

    return params, state


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a plain name->numpy dict.

    Uses torch when importable (it is baked into this environment); falls
    back to raw pickle for already-converted dicts.
    """
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        # torch missing, or the file is a plain pickle of an
        # already-converted dict ("Invalid magic number")
        with open(path, "rb") as f:
            obj = pickle.load(f)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}
