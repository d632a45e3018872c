"""Per-stage roofline audit of the 512x256 inference pipeline (round 3).

Times each generator stage in isolation with the fori_loop differencing
harness and reports measured ms vs the stage's analytic roofline bound
(MXU bf16 / HBM BW / transcendental rate) so PERFORMANCE.md can carry a
real accounting of where time goes and what the ceiling is.
"""
import sys, os
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from benchmarks.timing import device_time, rpc_floor

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import init_generator
from threedhumangan_tpu.models.mapping import (
    apply_mapping_network, apply_two_part_mapping_network)
from threedhumangan_tpu.models import volume_rendering as vr
from threedhumangan_tpu.models.smpl import synthetic_smpl_model, get_geo_features
from threedhumangan_tpu.ops.raymarch import (
    fused_field_render, pack_field_inputs)
from threedhumangan_tpu.ops.synthesis_kernel import (
    fold_synthesis_params, fused_synthesis)

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
TILE_RAYS = int(os.environ.get("BENCH_TILE_RAYS", "64"))
MARCH_LOOP = os.environ.get("BENCH_MARCH_LOOP", "0") == "1"
SYNTH_TILE = int(os.environ.get("BENCH_SYNTH_TILE", "2"))
STEP_PACK = int(os.environ.get("BENCH_STEP_PACK", "2"))  # bench.py default
PIPE2 = os.environ.get("BENCH_FOLD_PIPE2", "0") == "1"
SYNTH_BPS = int(os.environ.get("BENCH_SYNTH_BPS", "4"))

meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta.update(dataset_length=BATCH, nerf_noise=0.0, perturb_rays=False,
            pallas_field=True, pallas_knn=True, pallas_synthesis=True,
            pallas_tile_rays=TILE_RAYS)

smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, BATCH, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
params, state = init_generator(rng, meta)
z0 = jax.random.normal(rng, (BATCH, meta["latent_dim"]))

B = BATCH
H = meta["hidden_dim"]; F = meta["feature_dim"]; G = meta["geo_feature_dim"]
RW, RH, S = meta["render_width"], meta["render_height"], meta["num_steps"]
GW, GH = meta["gen_width"], meta["gen_height"]
R = RW * RH
P = R * S

print(f"rpc floor {rpc_floor()*1000:.1f} ms; batch {BATCH} "
      f"tile_rays={TILE_RAYS} march_loop={MARCH_LOOP} synth_tile={SYNTH_TILE}",
      flush=True)

def tick(x):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(x)) * 1e-30

# --- precompute fixed stage inputs (outside the timed loops); ONE jit so
# the tunnel sees a single dispatch, not thousands of eager RPCs ---
cond0 = jax.jit(lambda b, k: pre(b, rotate=True, rng=k))(batch, rng)


@jax.jit
def _precompute(cond, key):
    focals = cond["intrinsics"][:, 0, 0]
    scales = cond["scales"].astype(jnp.float32)
    pts_cam, zv, rd_cam = vr.get_initial_rays_weak_perspective(
        focals, scales, S, resolution=(RW, RH),
        ray_start=meta["ray_start"], ray_end=meta["ray_end"])
    (points, zvals, ray_dirs, _, _, _, _) = vr.transform_sampled_points(
        pts_cam, zv, rd_cam, key, cam2world_matrix=cond["cam2world_matrices"],
        mode=meta.get("sample_dist"), h_stddev=0.0, v_stddev=0.0, perturb=False)
    points = points.reshape(B, P, 3)
    dirs = vr.expand_ray_directions(ray_dirs, S)
    geo = get_geo_features(points, cond["skeletons_xyz"], cond["vertices"],
                           cond["tpose_vertices"], cond["fk_matrices"],
                           cond["lbs_weights"], use_pallas_knn=True)
    packed = pack_field_inputs(points, geo, dirs, 2.0 / meta["side_length"])
    return focals, scales, points, dirs, geo, packed, zvals.reshape(B, R, S)


focals, scales, points0, dirs0, geo0, packed0, zflat0 = _precompute(cond0, rng)
freq0, phase0 = apply_mapping_network(params["neural_field_mapping_network"], z0)
_, styles0 = apply_two_part_mapping_network(params["synthesis_mapping_network"], z0)

render_out0, _ = jax.jit(lambda pk: fused_field_render(
    params["neural_field"], pk, freq0, phase0, zflat0, num_steps=S,
    tile_rays=TILE_RAYS, compute_dtype=jnp.bfloat16,
    march_loop=MARCH_LOOP, step_pack=STEP_PACK))(packed0)
featmap0 = render_out0[..., 3:].reshape(B, RH, RW, F)
up0 = jax.image.resize(featmap0.astype(jnp.bfloat16), (B, GH, GW, F), "bilinear")
folded0 = fold_synthesis_params(params["synthesis_network"], state["synthesis_network"],
                                params["synthesis_input"], meta["spatial_normalization"])

stages = {}

# 1. mapping networks
def st_mapping(i, c):
    z = z0 + c
    f, p = apply_mapping_network(params["neural_field_mapping_network"], z)
    _, s = apply_two_part_mapping_network(params["synthesis_mapping_network"], z)
    return tick((f, p, s))
stages["mapping"] = st_mapping

# 2. ray generation + transform
def st_rays(i, c):
    pc, zz, rc = vr.get_initial_rays_weak_perspective(
        focals + c, scales, S, resolution=(RW, RH),
        ray_start=meta["ray_start"], ray_end=meta["ray_end"])
    out = vr.transform_sampled_points(
        pc, zz, rc, jax.random.fold_in(rng, i),
        cam2world_matrix=cond0["cam2world_matrices"],
        mode=meta.get("sample_dist"), h_stddev=0.0, v_stddev=0.0, perturb=False)
    return tick(out[:3])
stages["rays"] = st_rays

# 3. geo features (Pallas 1-NN + gather + canonicalization)
def st_geo(i, c):
    g = get_geo_features(points0 + c, cond0["skeletons_xyz"], cond0["vertices"],
                         cond0["tpose_vertices"], cond0["fk_matrices"],
                         cond0["lbs_weights"], use_pallas_knn=True)
    return tick(g)
stages["geo_features"] = st_geo

# 3b. fused geo-features kernel (ops/geo.py)
def st_geo_pallas(i, c):
    g = get_geo_features(points0 + c, cond0["skeletons_xyz"], cond0["vertices"],
                         cond0["tpose_vertices"], cond0["fk_matrices"],
                         cond0["lbs_weights"], use_pallas_geo=True)
    return tick(g)
stages["geo_fused"] = st_geo_pallas

# 4. pack (concat + transpose into kernel layout)
def st_pack(i, c):
    pk = pack_field_inputs(points0 + c, geo0, dirs0, 2.0 / meta["side_length"])
    return tick(pk)
stages["pack"] = st_pack

# 5. field kernel
def st_field(i, c):
    out, d = fused_field_render(
        params["neural_field"], packed0 + c, freq0, phase0, zflat0,
        num_steps=S, tile_rays=TILE_RAYS, compute_dtype=jnp.bfloat16,
        march_loop=MARCH_LOOP, step_pack=STEP_PACK, pipe2=PIPE2)
    return tick((out, d))
stages["field_kernel"] = st_field

# 6. feature-map resize
def st_resize(i, c):
    up = jax.image.resize((featmap0 + c).astype(jnp.bfloat16), (B, GH, GW, F), "bilinear")
    return tick(up)
stages["resize"] = st_resize

# 7. synthesis kernel (folded params threaded as jit args — as closure
# consts they exceed the tunnel's remote-compile request size limit)
def st_synth(i, c, folded, up, styles):
    r = fused_synthesis(folded, up + c, styles, num_blocks=meta["synthesis_blocks"],
                        mod_blocks=tuple(meta["mod_blocks"]),
                        map3d_mode=meta.get("map3d_mode", "isolated"),
                        tile_rows=SYNTH_TILE, compute_dtype=jnp.bfloat16,
                        blocks_per_stage=SYNTH_BPS)
    return tick(r)
stages["synthesis_kernel"] = (st_synth, (folded0, up0, styles0))

# analytic bounds (v5e: ~197 TFLOP/s bf16 MXU, ~820 GB/s HBM)
MXU = 197e12; BW = 820e9
field_flops = B * P * 2 * H * (3 + G + 2*H + 3*H + H + 3 + F + 1)
synth_flops = B * GH * GW * 9 * 2 * (2 * (H*128 + 128*H*2 + H*H))
geo_flops = B * P * 2 * 6890 * 3  # 1-NN distance matmul
bounds = {
    "mapping": (B * (4*H*H + 2*H*8*H + 8*H*H) * 2) / MXU,
    "field_kernel": field_flops / MXU,
    "synthesis_kernel": synth_flops / MXU,
    "geo_features": geo_flops / MXU,
    "resize": (B*GH*GW*F*2 + B*RH*RW*F*4) / BW,
    "pack": (2 * B * P * 37 * 4) / BW,
}

only = [s for s in os.environ.get("BENCH_STAGES", "").split(",") if s]
total = 0.0
for name, fn in stages.items():
    if only and name not in only:
        continue
    fn, extra_args = fn if isinstance(fn, tuple) else (fn, ())
    per, chk = device_time(fn, n1=2, n2=8, args=extra_args)
    total += per
    bound = bounds.get(name)
    extra = f"  roofline {bound*1000:6.2f} ms ({bound/per*100:5.1f}% attained)" if bound else ""
    print(f"{name:18s}: {per*1000:7.2f} ms/batch{extra}", flush=True)
print(f"{'sum of stages':18s}: {total*1000:7.2f} ms/batch -> {BATCH/total:.1f} imgs/s")
