"""Fused geo-features Pallas kernel (ops/geo.py) vs the XLA reference path
(models/smpl.get_geo_features, ref lib/components/smpl.py:210-249).

Interpret mode on CPU; the same kernel compiles for TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models.smpl import get_geo_features
from threedhumangan_tpu.ops.geo import build_vertex_features, geo_features_pallas


def _rand_rigid(key, n):
    """Random well-conditioned 4x4 rigid-ish transforms (invertible)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    ang = jax.random.uniform(k2, (n, 1), minval=-1.0, maxval=1.0)
    kx = jnp.cross(jnp.eye(3)[None], axis[:, None, :])
    R = (jnp.eye(3)[None] + jnp.sin(ang)[..., None] * kx
         + (1 - jnp.cos(ang))[..., None] * (kx @ kx))
    t = jax.random.normal(k2, (n, 3)) * 0.3
    M = jnp.zeros((n, 4, 4)).at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return M.at[:, 3, 3].set(1.0)


@pytest.mark.parametrize("legacy_mode", [False, True])
def test_geo_kernel_matches_xla_path(rng, legacy_mode):
    B, P, V, J = 2, 96, 200, 24  # P=96 exercises the tile padding (tile=128)
    keys = jax.random.split(rng, 6)
    points = jax.random.normal(keys[0], (B, P, 3))
    vertices = jax.random.normal(keys[1], (B, V, 3))
    tpose = jax.random.normal(keys[2], (B, V, 3)) * 0.5
    skel = jax.random.normal(keys[3], (B, J, 3))
    fk = _rand_rigid(keys[4], B * J).reshape(B, J, 4, 4)
    lbs = jax.nn.softmax(jax.random.normal(keys[5], (B, V, J)) * 2.0, axis=-1)

    ref = get_geo_features(points, skel, vertices, tpose, fk, lbs,
                           legacy_mode=legacy_mode)
    vfeat = build_vertex_features(tpose, fk, lbs)
    got = geo_features_pallas(points, vertices, vfeat, skel,
                              legacy_mode=legacy_mode, interpret=True)

    assert got.shape == ref.shape == (B, P, 31)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_geo_kernel_nearest_index_tiebreak(rng):
    """Duplicate vertices: the kernel must pick the LOWEST index (torch min /
    pytorch3d knn_points semantics), so the gathered tpose coords must match
    the XLA path exactly."""
    B, P, V, J = 1, 128, 64, 24
    keys = jax.random.split(rng, 4)
    points = jax.random.normal(keys[0], (B, P, 3))
    base = jax.random.normal(keys[1], (B, V // 2, 3))
    vertices = jnp.concatenate([base, base], axis=1)  # every vertex duplicated
    tpose = jax.random.normal(keys[2], (B, V, 3))
    skel = jax.random.normal(keys[3], (B, J, 3))
    fk = jnp.broadcast_to(jnp.eye(4), (B, J, 4, 4))
    lbs = jnp.full((B, V, J), 1.0 / J)

    ref = get_geo_features(points, skel, vertices, tpose, fk, lbs)
    vfeat = build_vertex_features(tpose, fk, lbs)
    got = geo_features_pallas(points, vertices, vfeat, skel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_geo_kernel_vertex_chunked_merge(rng):
    """Multi-chunk 1-NN scan (the VMEM-bounded production shape): results
    must match the single-chunk scan bitwise, including ties that straddle
    chunk boundaries (every vertex duplicated half-a-mesh apart, so each
    tie's two rows land in different chunks — the strict-less ascending
    merge must keep the LOWER global index)."""
    B, P, V, J = 2, 256, 288, 24
    keys = jax.random.split(rng, 4)
    points = jax.random.normal(keys[0], (B, P, 3))
    base = jax.random.normal(keys[1], (B, V // 2, 3))
    vertices = jnp.concatenate([base, base], axis=1)
    tpose = jax.random.normal(keys[2], (B, V, 3))
    skel = jax.random.normal(keys[3], (B, J, 3))
    fk = jnp.broadcast_to(jnp.eye(4), (B, J, 4, 4))
    lbs = jnp.full((B, V, J), 1.0 / J)

    vfeat = build_vertex_features(tpose, fk, lbs)
    one = geo_features_pallas(points, vertices, vfeat, skel,
                              vertex_chunks=1, interpret=True)
    many = geo_features_pallas(points, vertices, vfeat, skel,
                               vertex_chunks=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(many), np.asarray(one))
    ref = get_geo_features(points, skel, vertices, tpose, fk, lbs)
    np.testing.assert_allclose(np.asarray(many), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.heavy
def test_geo_flag_through_get_geo_features(rng):
    B, P, V, J = 1, 64, 50, 24
    keys = jax.random.split(rng, 5)
    points = jax.random.normal(keys[0], (B, P, 3))
    vertices = jax.random.normal(keys[1], (B, V, 3))
    tpose = jax.random.normal(keys[2], (B, V, 3))
    skel = jax.random.normal(keys[3], (B, J, 3))
    fk = _rand_rigid(keys[4], B * J).reshape(B, J, 4, 4)
    lbs = jax.nn.softmax(jax.random.normal(keys[4], (B, V, J)), axis=-1)

    ref = get_geo_features(points, skel, vertices, tpose, fk, lbs)
    got = get_geo_features(points, skel, vertices, tpose, fk, lbs,
                           use_pallas_geo=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
