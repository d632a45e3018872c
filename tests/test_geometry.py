"""Geometry tests: rays, cameras, integration, LBS, geo features.

Oracles are direct numpy re-statements of the reference math
(lib/generators/volume_rendering.py, lib/components/smpl.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models import smpl as smpl_mod
from threedhumangan_tpu.models import volume_rendering as vr


# ---------------------------------------------------------------------------
# rays
# ---------------------------------------------------------------------------


def test_weak_perspective_rays_shapes_and_grid():
    focals = jnp.asarray([3.0, 3.0])
    scales = jnp.asarray([1.5, 2.0])
    W, H, S = 4, 8, 5
    points, z_vals, rays_d = vr.get_initial_rays_weak_perspective(
        focals, scales, S, (W, H), ray_start=-0.5, ray_end=0.5)
    assert points.shape == (2, H * W, S, 3)
    assert z_vals.shape == (2, H * W, S, 1)
    assert rays_d.shape == (2, H * W, 3)

    # directions are unit-norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, rtol=1e-5)

    # pixel order: row-major, x varies fastest; first pixel is (-W/H, -1)
    d0 = np.asarray(rays_d)[0, 0]
    expected = np.asarray([-W / H, -1.0, 3.0])
    np.testing.assert_allclose(d0, expected / np.linalg.norm(expected), rtol=1e-5)

    # z offset = focal/scale (ref :104-106)
    zc = np.asarray(z_vals)[0, 0, :, 0]
    np.testing.assert_allclose(zc, np.linspace(-0.5, 0.5, S) + 3.0 / 1.5, rtol=1e-5)

    # points = dir * z
    np.testing.assert_allclose(
        np.asarray(points)[1, 3, 2], np.asarray(rays_d)[1, 3] * np.asarray(z_vals)[1, 3, 2, 0],
        rtol=1e-5)


def test_cam2world_lookat_maps_origin():
    origin = jnp.asarray([[0.0, 0.0, 2.0]])
    forward = -origin  # looking at world origin
    m = vr.create_cam2world_matrix(forward, origin)
    # camera origin in world coords
    np.testing.assert_allclose(np.asarray(m)[0, :3, 3], [0, 0, 2], atol=1e-6)
    # camera forward (+z in cam space) points toward world origin
    fwd_world = np.asarray(m)[0, :3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(fwd_world, [0, 0, -1.0], atol=1e-6)


def test_transform_sampled_points_given_cam2world(rng):
    B, R, S = 2, 6, 4
    k1 = rng
    points = jax.random.normal(k1, (B, R, S, 3))
    z_vals = jnp.cumsum(jnp.ones((B, R, S, 1)), axis=2)
    dirs = vr.normalize_vecs(jax.random.normal(k1, (B, R, 3)))

    # translation-only camera
    c2w = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).at[:, :3, 3].set(jnp.asarray([[1.0, 2, 3]] * B))
    tp, tz, td, to_, pitch, yaw, w2c = vr.transform_sampled_points(
        points, z_vals, dirs, rng, cam2world_matrix=c2w, perturb=False, mode=None)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(points) + np.array([1.0, 2, 3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(td), np.asarray(dirs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(to_)[0, 0], [1.0, 2, 3], atol=1e-6)
    # world2cam is the inverse
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bjk->bik", w2c, c2w)), np.tile(np.eye(4), (B, 1, 1)), atol=1e-5)


def test_perturb_points_stays_within_interval(rng):
    B, R, S = 1, 4, 6
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S).reshape(1, 1, S, 1), (B, R, S, 1))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0, 1.0]), (B, R, 3))
    pts = dirs[:, :, None, :] * z
    p2, z2 = vr.perturb_points(pts, z, dirs, rng)
    dz = np.asarray(z2 - z)
    step = 1.0 / (S - 1)
    assert (np.abs(dz) <= step / 2 + 1e-6).all()
    np.testing.assert_allclose(np.asarray(p2 - pts)[..., 2:3], dz, atol=1e-6)


# ---------------------------------------------------------------------------
# ray integration oracle (ref volume_rendering.py:12-56)
# ---------------------------------------------------------------------------


def integration_oracle(field, z_vals, white_back=False, last_back=False):
    feats, sig = field[..., :-1], field[..., -1:]
    deltas = z_vals[:, :, 1:] - z_vals[:, :, :-1]
    deltas = np.concatenate([deltas, 1e9 * np.ones_like(deltas[:, :, :1])], axis=-2)
    alphas = 1 - np.exp(-deltas * np.maximum(sig, 0))
    shifted = np.concatenate([np.ones_like(alphas[:, :, :1]), 1 - alphas + 1e-12], axis=-2)
    weights = alphas * np.cumprod(shifted, axis=-2)[:, :, :-1]
    wsum = weights.sum(2)
    if last_back:
        weights[:, :, -1] += 1 - wsum
        out = (weights * feats).sum(-2)
        depth = (weights * z_vals).sum(-2)
    else:
        out = (weights * feats).sum(-2)
        wd = weights.copy()
        wd[:, :, -1] += 1 - wsum
        depth = (wd * z_vals).sum(-2)
    if white_back:
        out = out + 1 - wsum
    return out, depth, weights


@pytest.mark.parametrize("white_back,last_back", [(False, False), (True, False), (False, True)])
def test_ray_integration_matches_oracle(rng, white_back, last_back):
    B, R, S, C = 2, 5, 7, 4
    k1, k2 = jax.random.split(rng)
    field = jax.random.normal(k1, (B, R, S, C + 1))
    z = jnp.sort(jax.random.uniform(k2, (B, R, S, 1)) + 1.0, axis=2)
    out, depth, w = vr.ray_integration(
        field, z, noise_std=0.0, white_back=white_back, last_back=last_back, clamp_mode="relu")
    eo, ed, ew = integration_oracle(np.asarray(field), np.asarray(z), white_back, last_back)
    np.testing.assert_allclose(np.asarray(out), eo, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), ed, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), ew, rtol=1e-4, atol=1e-5)


def test_ray_integration_opaque_surface():
    # a wall of high density at step 3 -> weights concentrate there
    B, R, S = 1, 1, 8
    sig = np.zeros((B, R, S, 1), np.float32)
    sig[:, :, 3] = 1e4
    feats = np.tile(np.arange(S, dtype=np.float32).reshape(1, 1, S, 1), (B, R, 1, 3))
    field = jnp.asarray(np.concatenate([feats, sig], -1))
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S).reshape(1, 1, S, 1), (B, R, S, 1))
    out, depth, w = vr.ray_integration(field, z, noise_std=0.0, clamp_mode="relu")
    np.testing.assert_allclose(np.asarray(out)[0, 0], [3.0, 3, 3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth)[0, 0, 0], float(np.asarray(z)[0, 0, 3, 0]), atol=1e-3)


def test_sample_pdf_concentrates_mass(rng):
    N, M = 4, 8
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, M + 1), (N, M + 1))
    weights = jnp.zeros((N, M)).at[:, 2].set(100.0)
    samples = vr.sample_pdf(bins, weights, 32, rng=rng)
    s = np.asarray(samples)
    frac_in_bin = ((s >= 2 / 8) & (s <= 3 / 8)).mean()
    assert frac_in_bin > 0.9


# ---------------------------------------------------------------------------
# SMPL / LBS
# ---------------------------------------------------------------------------


def test_batch_rodrigues_identity_and_axis():
    aa = jnp.zeros((1, 3))
    R = smpl_mod.batch_rodrigues(aa)
    np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-5)

    aa = jnp.asarray([[0.0, 0.0, math.pi / 2]])
    R = np.asarray(smpl_mod.batch_rodrigues(aa))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1.0, 0], atol=1e-5)


def test_euler_xyz_matches_composition():
    e = jnp.asarray([[0.3, -0.2, 0.7]])
    R = np.asarray(smpl_mod.euler_angles_to_matrix_xyz(e))[0]

    def rot(axis, t):
        c, s = np.cos(t), np.sin(t)
        if axis == 0:
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == 1:
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rot(0, 0.3) @ rot(1, -0.2) @ rot(2, 0.7)
    np.testing.assert_allclose(R, expected, atol=1e-5)


def test_lbs_rest_pose_is_template():
    model = smpl_mod.synthetic_smpl_model(num_verts=64, num_faces=32)
    betas = jnp.zeros((2, 10))
    pose = jnp.zeros((2, model.num_joints * 3))
    A, v_shaped, verts, J, J_t = smpl_mod.lbs(
        betas, pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights)
    # rest pose: verts == template, fk matrices ~ pure translations near 0
    np.testing.assert_allclose(np.asarray(verts)[0], np.asarray(model.v_template), atol=1e-4)
    np.testing.assert_allclose(np.asarray(J_t), np.asarray(J), atol=1e-4)
    np.testing.assert_allclose(np.asarray(A)[0, :, :3, :3],
                               np.tile(np.eye(3), (model.num_joints, 1, 1)), atol=1e-5)


def test_lbs_global_rotation_rotates_everything():
    model = smpl_mod.synthetic_smpl_model(num_verts=64, num_faces=32)
    betas = jnp.zeros((1, 10))
    pose = jnp.zeros((1, model.num_joints * 3)).at[0, 2].set(math.pi / 2)  # root z-rot
    A, v_shaped, verts, J, J_t = smpl_mod.lbs(
        betas, pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights)
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    root = np.asarray(J)[0, 0]
    expected = (np.asarray(v_shaped)[0] - root) @ Rz.T + root
    np.testing.assert_allclose(np.asarray(verts)[0], expected, atol=1e-3)


def test_geo_features_shapes_and_rest_pose_semantics():
    model = smpl_mod.synthetic_smpl_model(num_verts=64, num_faces=32)
    B, P, J, V = 2, 50, model.num_joints, model.num_verts
    betas = jnp.zeros((B, 10))
    pose = jnp.zeros((B, J * 3))
    A, v_shaped, verts, Jj, J_t = smpl_mod.lbs(
        betas, pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights)

    key = jax.random.PRNGKey(3)
    points = jax.random.normal(key, (B, P, 3)) * 0.5
    lbsw = jnp.broadcast_to(model.lbs_weights[None], (B, V, J))
    feats = smpl_mod.get_geo_features(points, J_t, verts, v_shaped, A, lbsw)
    assert feats.shape == (B, P, 3 + J + 3 + 1)

    # rest pose: inverse FK ~ identity, so cano coords = scaled points
    cano = np.asarray(feats)[..., :3]
    pts = np.asarray(points)
    np.testing.assert_allclose(cano[..., 0], pts[..., 0] / 2.0, atol=1e-3)
    np.testing.assert_allclose(cano[..., 1], (pts[..., 1] + 0.2) / 2.0, atol=1e-3)
    np.testing.assert_allclose(cano[..., 2], pts[..., 2] / 1.3, atol=1e-3)

    # joint distances channel
    jd = np.asarray(feats)[..., 3 : 3 + J]
    d = np.linalg.norm(pts[:, :, None] - np.asarray(J_t)[:, None], axis=-1) / 2.4
    np.testing.assert_allclose(jd, d, atol=1e-3)

    # legacy mode flips concat order (ref :239-242)
    feats_l = smpl_mod.get_geo_features(points, J_t, verts, v_shaped, A, lbsw, legacy_mode=True)
    np.testing.assert_allclose(np.asarray(feats_l)[..., :J], d, atol=1e-3)
