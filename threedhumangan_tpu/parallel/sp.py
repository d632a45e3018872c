"""Sequence-parallel (ray-axis) sharding for the volume renderer.

The reference's only memory-scaling lever for the 65k-point field is
sequential chunking (`max_points=50000`, map3d_generator.py:433-444 —
SURVEY.md §5 'the CP/ring-attention analogue for this workload').  On TPU
the natural parallel form is sharding the RAY axis across a second mesh
axis: rays are embarrassingly parallel through geo-features, the field and
per-ray integration, so the only collective is the final all_gather of the
rendered feature map — riding ICI, exactly the sequence-parallel recipe.

``sp_render_rays`` runs the (B-sharded, ray-sharded) field+integration under
``shard_map`` over a ('data', 'model') mesh; combined with the data-parallel
train/infer steps this gives a true 2-axis layout: batch over 'data', rays
over 'model'.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sp_render_rays(
    mesh: Mesh,
    field_params: Dict,
    points: jax.Array,      # (B, R*S, 3), ray-major
    geo: jax.Array,         # (B, R*S, G)
    dirs: jax.Array,        # (B, R*S, 3)
    freq: jax.Array,        # (B, L)
    phase: jax.Array,       # (B, L)
    z_vals: jax.Array,      # (B, R, S)
    meta: Dict,
    compute_dtype=jnp.bfloat16,
):
    """Returns (rendered (B, R, F+3), depth (B, R, 1)) with the ray axis
    sharded over the 'model' mesh axis and batch over 'data'."""
    from jax.experimental.shard_map import shard_map

    from threedhumangan_tpu.models.siren import NEURAL_FIELD_REGISTRY
    from threedhumangan_tpu.models import volume_rendering as vr

    num_steps = meta["num_steps"]
    field_apply = NEURAL_FIELD_REGISTRY[meta["neural_field_cls"]][1]

    def local(field_params, points, geo, dirs, freq, phase, z_vals):
        # everything here sees its LOCAL ray shard; no collectives needed
        # until the (implicit) gather on return
        B, P_local, _ = points.shape
        out = field_apply(
            field_params, points, freq, phase, geo, dirs,
            input_scaler=2.0 / meta["side_length"], compute_dtype=compute_dtype,
            fast_math=meta.get("fast_math", True))
        out = out.reshape(B, P_local // num_steps, num_steps, -1)
        rendered, depth, _ = vr.ray_integration(
            out, z_vals[..., None], noise_std=0.0,
            white_back=meta.get("white_back", False),
            last_back=meta.get("last_back", False),
            clamp_mode=meta["clamp_mode"])
        return rendered, depth

    # batch over 'data'; rays (axis 1) over 'model'; params/conditioning
    # replicated.  The out_specs re-assemble the full ray axis — XLA lowers
    # that to an all_gather over ICI.
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data", "model"), P("data", "model"), P("data", "model"),
                  P("data"), P("data"), P("data", "model")),
        out_specs=(P("data", "model"), P("data", "model")),
        check_rep=False,
    )
    return sharded(field_params, points, geo, dirs, freq, phase, z_vals)
