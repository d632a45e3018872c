"""Tests for the reference-dead public-surface items (round 3, VERDICT #7):
fill_mode='debug', get_initial_rays_trig, perspective_projection, skeleton
heatmaps, the legacy TwoPartMappingNetwork_, and non-square ADA rotate90.
All are dead in the reference live path but part of its public surface
(ref lib/generators/volume_rendering.py:49-83, lib/components/util.py:94-156,
lib/components/mapping_networks.py:44-89)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from threedhumangan_tpu.models import volume_rendering as vr
from threedhumangan_tpu.models.mapping import (
    apply_two_part_mapping_network_legacy,
    init_two_part_mapping_network_legacy,
)
from threedhumangan_tpu.utils.misc import (
    perspective_projection,
    skeleton_uvd_to_heatmap,
    visualize_heatmap,
)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def test_ray_integration_fill_mode_debug(rng):
    # two rays: one dense (opaque), one empty — the empty one paints red
    B, R, S = 1, 2, 8
    sigmas = jnp.zeros((B, R, S, 1)).at[0, 0].set(100.0)
    features = jnp.full((B, R, S, 3), 0.5)
    field_out = jnp.concatenate([features, sigmas], axis=-1)
    z_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S).reshape(1, 1, S, 1), (B, R, S, 1))
    out, _, _ = vr.ray_integration(field_out, z_vals, noise_std=0.0,
                                   fill_mode="debug")
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.5, 0.5, 0.5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[0, 1]), [1.0, 0.0, 0.0], atol=1e-6)


def test_get_initial_rays_trig_geometry():
    n, S, W, H = 2, 4, 6, 8
    fov = 60.0
    points, z_vals, rays_d = vr.get_initial_rays_trig(
        n, S, fov=fov, resolution=(W, H), ray_start=0.5, ray_end=1.5)
    assert points.shape == (n, W * H, S, 3)
    assert z_vals.shape == (n, W * H, S, 1)
    assert rays_d.shape == (n, W * H, 3)
    # directions are unit length and share the focal z before normalization
    norms = np.linalg.norm(np.asarray(rays_d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # center-ish ray points straight at +z: its x,y are the smallest
    focal = 1.0 / math.tan(math.pi * fov / 180.0 / 2.0)
    # reconstruct: z/x ratio of the corner ray matches focal/span
    span = W / H
    corner = np.asarray(rays_d[0, 0])
    np.testing.assert_allclose(corner[2] / abs(corner[0]), focal / span, rtol=1e-5)
    # points = dir * z, z linspace offsets
    np.testing.assert_allclose(
        np.asarray(points[0, 3, 2]),
        np.asarray(rays_d[0, 3]) * np.asarray(z_vals[0, 3, 2]), atol=1e-6)


def test_perspective_projection_identity_camera(rng):
    B, N = 2, 5
    pts = jax.random.normal(rng, (B, N, 3)) + jnp.asarray([0.0, 0.0, 5.0])
    intr = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    extr = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    proj = perspective_projection(pts, intr, extr)
    expected_xy = np.asarray(pts[..., :2]) / np.asarray(pts[..., 2:3])
    np.testing.assert_allclose(np.asarray(proj[..., :2]), expected_xy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj[..., 2]), np.asarray(pts[..., 2]), atol=1e-6)


def test_perspective_projection_applies_extrinsics(rng):
    B, N = 1, 4
    pts = jax.random.normal(rng, (B, N, 3))
    extr = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 2, 3].set(10.0)
    intr = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    proj = perspective_projection(pts, intr, extr)
    np.testing.assert_allclose(
        np.asarray(proj[..., 2]), np.asarray(pts[..., 2]) + 10.0, atol=1e-5)


def test_skeleton_heatmap_peaks_at_joints():
    uv = jnp.asarray([[[0.0, 0.0], [0.5, -0.5]]])  # (1, 2, 2)
    H, W = 32, 16
    hm = skeleton_uvd_to_heatmap(uv, (W, H), sigma=0.1)
    assert hm.shape == (1, 2, H, W)
    hm0 = np.asarray(hm[0, 0])
    iy, ix = np.unravel_index(hm0.argmax(), hm0.shape)
    # joint at uv (0,0) -> image center
    assert abs(iy - (H - 1) / 2) <= 1 and abs(ix - (W - 1) / 2) <= 1
    assert hm0.max() <= 1.0 + 1e-6


def test_skeleton_heatmap_with_depth_channel():
    uv = jnp.zeros((2, 3, 2))
    depth = jnp.asarray([[-2.0, 0.5, 0.0]] * 2)  # clipped to [-1, 1]
    hm = skeleton_uvd_to_heatmap(uv, (8, 8), depth=depth)
    assert hm.shape == (2, 3, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(hm[0, 0, 1]), -1.0)


def test_visualize_heatmap_shape_and_range():
    uvd = jnp.asarray([[[0.0, 0.0, 0.5], [0.3, -0.3, -0.2]]])
    img = visualize_heatmap(uvd, (16, 32), depth_length=2.0)
    assert img.shape == (1, 3, 32, 16)
    assert np.asarray(img).min() >= 0.0


def test_legacy_two_part_mapping_shapes_and_grad(rng):
    params = init_two_part_mapping_network_legacy(
        rng, latent_dim=16, map_hidden_dim=32, implicit_output_dim=8,
        superres_output_dim=24, trunk_layers=2, branch_layers=2, normalize=True)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    imp, sup = apply_two_part_mapping_network_legacy(params, z)
    assert imp.shape == (4, 8)
    assert sup.shape == (4, 24)
    # trunk has trunk_layers+1 linears (ref :49-56), branches branch_layers
    assert len(params["trunk"]) == 3
    assert len(params["implicit"]) == 2 and len(params["superres"]) == 2

    def loss(p):
        i, s = apply_two_part_mapping_network_legacy(p, z)
        return jnp.sum(i ** 2) + jnp.sum(s ** 2)

    g = jax.grad(lambda p: loss({k: p[k] for k in ("trunk", "implicit", "superres")}
                                | {"normalize": params["normalize"]}))(
        {k: params[k] for k in ("trunk", "implicit", "superres")})
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in flat)


def test_rotate90_nonsquare_all_rotations():
    from threedhumangan_tpu.data.augment import augment_pipe

    # 2:1 image with a distinctive corner marker; p=1, rotate90 only
    B, H, W = 8, 8, 4
    images = jnp.zeros((B, H, W, 3)).at[:, 0, 0, 0].set(1.0)
    cfg = {"rotate90": 1}
    out = augment_pipe(images, jax.random.PRNGKey(3), cfg, p=1.0)
    assert out.shape == images.shape
    # across a batch of 8 all four rotations should be drawn: collect the
    # marker position per image and require >2 distinct outcomes (0/180 only
    # would give at most 2)
    marks = set()
    o = np.asarray(out)
    for b in range(B):
        pos = np.unravel_index(np.abs(o[b, :, :, 0]).argmax(), (H, W))
        if o[b].max() > 1e-6:
            marks.add(pos)
        else:
            marks.add(("cropped",))
    assert len(marks) > 2, marks


def test_rotate90_square_matches_rot90():
    from threedhumangan_tpu.data.augment import augment_pipe

    B, S = 4, 6
    images = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 3))
    cfg = {"rotate90": 1}
    out = augment_pipe(images, jax.random.PRNGKey(7), cfg, p=1.0)
    o = np.asarray(out)
    im = np.asarray(images)
    for b in range(B):
        ok = any(np.allclose(o[b], np.rot90(im[b], r, axes=(0, 1)), atol=1e-6)
                 for r in range(4))
        assert ok, b
