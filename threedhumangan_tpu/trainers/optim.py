"""Optimizers: Adam with per-subtree learning-rate multipliers.

Behavioural parity with reference ``lib/trainers/phase_trainer.py``
init_optimizer (:57-84): five generator param groups —
  generator (x1), appearance_codes (x appearance_codes_lr_mul),
  neural_field_mapping (x mapping_net_lr_mul), synthesis_mapping (x1),
  neural_field (x neural_field_lr_mul)
— plus a flat Adam for the discriminator.  Gradients are clipped by global
norm BEFORE the Adam update (ref train_* :313-316, :335-337), matching
torch's clip_grad_norm_-then-step ordering.

The learning rate is a traced scalar so curriculum lr changes
(configs/map3d.py int-key blocks) never retrigger compilation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def make_adam(betas: Tuple[float, float], eps: float = 1e-8):
    return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)


def generator_lr_multipliers(params: Dict, meta: Dict) -> Dict:
    """Per-leaf lr multiplier tree mirroring the reference's 5 param groups."""
    group_mult = {
        "latent_pool": meta.get("appearance_codes_lr_mul", 1.0),
        "neural_field_mapping_network": meta.get("mapping_net_lr_mul", 1.0),
        "synthesis_mapping_network": 1.0,
        "neural_field": meta.get("neural_field_lr_mul", 1.0),
    }
    out = {}
    for k, sub in params.items():
        m = group_mult.get(k, 1.0)
        out[k] = jax.tree.map(lambda _: m, sub)
    return out


def clip_by_global_norm(grads, max_norm: float):
    """torch clip_grad_norm_ semantics (clip factor applied when norm >
    max_norm; no-op otherwise)."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    factor = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * factor, grads), norm


def adam_step(
    opt: optax.GradientTransformation,
    opt_state,
    grads: Dict,
    params: Dict,
    lr: jax.Array,
    lr_multipliers=None,
    grad_clip: float = 0.0,
):
    """clip -> adam moments -> per-group lr scale -> apply."""
    if grad_clip and grad_clip > 0:
        grads, _ = clip_by_global_norm(grads, grad_clip)
    updates, new_opt_state = opt.update(grads, opt_state, params)
    if lr_multipliers is None:
        updates = jax.tree.map(lambda u: -lr * u, updates)
    else:
        updates = jax.tree.map(lambda u, m: -lr * m * u, updates, lr_multipliers)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    return new_params, new_opt_state
