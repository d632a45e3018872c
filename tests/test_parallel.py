"""Multi-device tests on the virtual 8-device CPU mesh: sharded training
step (DP ≡ reference DDP), cross-replica BN, stats psum, and the driver's
dryrun_multichip entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from threedhumangan_tpu.models import synthesis as syn
from threedhumangan_tpu.parallel.mesh import create_mesh
from threedhumangan_tpu.parallel.stats import moments, psum_moments


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def test_sync_batch_norm_cross_replica_moments(rng):
    """pmean'd batch moments == global batch moments (SyncBatchNorm parity)."""
    mesh = create_mesh(n_data=8)
    params, state = syn.init_sync_batch_norm(4)
    x = jax.random.normal(rng, (16, 4, 4, 4)) * 3 + 2

    def local(x):
        y, new_state = syn.apply_sync_batch_norm(params, state, x, train=True, axis_name="data")
        return y, new_state

    y, new_state = jax.jit(shard_map(
        local, mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P()),
        check_rep=False))(x)

    # global normalization: full-batch mean/var
    xr = np.asarray(x)
    mean = xr.mean((0, 1, 2))
    var = xr.var((0, 1, 2))
    expected = (xr - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)


def test_psum_moments_aggregates(rng):
    mesh = create_mesh(n_data=8)
    x = jnp.arange(16.0).reshape(16, 1)

    def local(x):
        return psum_moments({"v": moments(x)}, "data")

    out = jax.jit(shard_map(
        local, mesh=mesh, in_specs=P("data"), out_specs=P(), check_rep=False))(x)
    count, total, sumsq = np.asarray(out["v"])
    assert count == 16
    np.testing.assert_allclose(total, np.arange(16.0).sum())


def test_sharded_grads_match_single_device(rng):
    """pmean'd per-shard grads == full-batch grads (DDP equivalence)."""
    mesh = create_mesh(n_data=8)
    w = jax.random.normal(rng, (4, 4))
    x = jax.random.normal(jax.random.PRNGKey(7), (16, 4))

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    g_full = jax.grad(loss)(w, x)

    def local(w, x):
        g = jax.grad(loss)(w, x)
        return jax.lax.pmean(g, "data")

    g_sharded = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_rep=False))(w, x)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_sharded), atol=1e-5)


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore")
def test_dryrun_multichip_entry():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_sequence_parallel_render_matches_single_device(rng):
    """Ray-axis (sequence-parallel) sharding over a 2-axis mesh reproduces
    the unsharded render exactly (parallel/sp.py)."""
    from threedhumangan_tpu.models import volume_rendering as vr
    from threedhumangan_tpu.models.siren import (
        apply_coordconcat_siren,
        init_coordconcat_siren,
    )
    from threedhumangan_tpu.parallel.mesh import create_mesh
    from threedhumangan_tpu.parallel.sp import sp_render_rays

    B, R, S = 2, 16, 4
    H, G, F, NB = 16, 31, 8, 4
    P_pts = R * S
    meta = {"num_steps": S, "side_length": 2.85, "clamp_mode": "relu",
            "white_back": True, "neural_field_cls": "COORDCONCATSIREN",
            "fast_math": False}

    params = init_coordconcat_siren(rng, 3, H, G, F, NB)
    ks = jax.random.split(rng, 6)
    points = jax.random.normal(ks[0], (B, P_pts, 3))
    geo = 0.3 * jax.random.normal(ks[1], (B, P_pts, G))
    dirs = jax.random.normal(ks[2], (B, P_pts, 3))
    freq = 0.1 * jax.random.normal(ks[3], (B, NB * H))
    phase = 0.1 * jax.random.normal(ks[4], (B, NB * H))
    z_vals = jnp.sort(jax.random.uniform(ks[5], (B, R, S)) + 1.0, axis=-1)

    # single device reference
    out = apply_coordconcat_siren(params, points, freq, phase, geo, dirs,
                                  input_scaler=2.0 / 2.85)
    out = out.reshape(B, R, S, F + 4)
    ref, ref_depth, _ = vr.ray_integration(
        out, z_vals[..., None], noise_std=0.0, white_back=True, clamp_mode="relu")

    mesh = create_mesh(n_data=2, n_model=4)
    got, got_depth = sp_render_rays(
        mesh, params, points, geo, dirs, freq, phase, z_vals, meta,
        compute_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(ref_depth), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_mesh_train_pair_matches_plain_steps():
    """The production sharded step (make_mesh_train_pair, = reference DDP
    wrap base_trainer.py:102-104) on a 1-device mesh reproduces the plain
    unsharded d/g steps exactly, and runs on the full 8-device mesh."""
    import copy

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.parallel.mesh import create_mesh, shard_batch
    from threedhumangan_tpu.trainers.phase_trainer import (
        init_train_state,
        make_mesh_train_pair,
        train_step_pair,
    )

    meta = copy.deepcopy(configs.extract_metadata(configs.MAP3DBN_NANO, 0))
    meta["batch_size"] = 2
    smpl = synthetic_smpl_model(seed=0, num_verts=96, num_faces=64)
    meta["dataset_length"] = 2
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = {k: jnp.asarray(v) for k, v in next(iterate_batches(ds, 2, shuffle=False)).items()}
    phase = {"rotate": False, "do_r1": True, "uncond": True, "gen_modal": "rgbs"}

    ts0 = init_train_state(jax.random.PRNGKey(0), meta)
    rng = jax.random.PRNGKey(42)

    # plain JITTED D+G pair with the mesh step's per-replica RNG folding
    # (axis_index=0); train_step_pair splits k_d/k_g from the folded key
    # exactly like the sharded step's body does.  (Driving the raw
    # d/g_train_step functions eagerly computes the same thing but pays
    # ~20s/step in op-by-op dispatch on the CPU CI host.)
    folded = jax.random.fold_in(rng, 0)
    ts_a, _ = train_step_pair(ts0, batch, folded, meta, pre, phase,
                              lr_g=1e-4, lr_d=4e-4, nerf_noise=0.5)

    # mesh step on 1 device
    mesh1 = create_mesh(n_data=1)
    step1 = make_mesh_train_pair(mesh1, pre, meta)
    ts_b, _ = step1(init_train_state(jax.random.PRNGKey(0), meta),
                    shard_batch(batch, mesh1), rng, phase,
                    lr_g=1e-4, lr_d=4e-4, nerf_noise=0.5)

    for name in ("params_G", "params_D"):
        ja = jax.tree.leaves(getattr(ts_a, name))
        jb = jax.tree.leaves(getattr(ts_b, name))
        for a, b in zip(ja, jb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=8e-6)

    # and the same factory runs on the full 8-device mesh (batch 2 -> use
    # a 2-wide data axis; remaining devices idle)
    mesh2 = create_mesh(n_data=2)
    step2 = make_mesh_train_pair(mesh2, pre, meta)
    ts_c, stats = step2(init_train_state(jax.random.PRNGKey(0), meta),
                        shard_batch(batch, mesh2), rng, phase,
                        lr_g=1e-4, lr_d=4e-4, nerf_noise=0.5)
    assert int(ts_c.step) == 1
    assert np.isfinite(np.asarray(stats["d_loss"])).all()
