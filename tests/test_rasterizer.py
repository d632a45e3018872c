"""Rasterizer tests: z-buffering, barycentrics, render/raster alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu.ops.rasterize import rasterize_mesh


def _single_triangle(z=1.0):
    # big triangle covering the image center
    verts = jnp.asarray([[[-0.8, -0.8, z], [0.8, -0.8, z], [0.0, 0.9, z]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    return verts, faces


def test_single_triangle_coverage():
    verts, faces = _single_triangle()
    p2f, bary, zbuf = rasterize_mesh(verts, faces, (16, 16), face_chunk=4, pixel_chunk=64)
    p2f = np.asarray(p2f)[0]
    assert p2f[8, 8] == 0          # center covered
    assert p2f[0, 0] == -1         # corner background
    np.testing.assert_allclose(np.asarray(zbuf)[0][p2f == 0], 1.0, atol=1e-5)
    # barycentrics sum to 1 where covered
    b = np.asarray(bary)[0][p2f == 0]
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
    assert (b >= -1e-6).all()


def test_zbuffer_picks_closer_face():
    # two stacked triangles; the closer one (z=0.5) must win
    v1, _ = _single_triangle(z=1.0)
    v2, _ = _single_triangle(z=0.5)
    verts = jnp.concatenate([v1, v2], axis=1)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    p2f, bary, zbuf = rasterize_mesh(verts, faces, (8, 8), face_chunk=1, pixel_chunk=16)
    assert np.asarray(p2f)[0, 4, 4] == 1
    np.testing.assert_allclose(np.asarray(zbuf)[0, 4, 4], 0.5, atol=1e-6)


def test_rectangular_image_aspect():
    # x spans ±W/H: for W=8, H=16, a triangle at x≈0.4 is inside (span=0.5)
    verts = jnp.asarray([[[0.2, -0.5, 1.0], [0.45, -0.5, 1.0], [0.3, 0.5, 1.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    p2f, _, _ = rasterize_mesh(verts, faces, (16, 8), face_chunk=4, pixel_chunk=32)
    cover = (np.asarray(p2f)[0] >= 0)
    assert cover.any()
    # covered pixels lie in the right half of the image
    assert not cover[:, :4].any()


def test_degenerate_faces_never_win():
    verts = jnp.asarray([[[-0.8, -0.8, 1.0], [0.8, -0.8, 1.0], [0.0, 0.9, 1.0],
                          [0.0, 0.0, 0.1]]])
    faces = jnp.asarray([[0, 1, 2], [3, 3, 3]], jnp.int32)  # degenerate 2nd
    p2f, _, _ = rasterize_mesh(verts, faces, (8, 8), face_chunk=2, pixel_chunk=16)
    assert (np.asarray(p2f) != 1).all()


def test_raster_aligns_with_ray_grid():
    """The core self-consistency property: a triangle at known NDC coords
    covers exactly the pixels whose ray-grid coordinates fall inside it."""
    H, W = 32, 16
    span = W / H
    verts = jnp.asarray([[[-span * 0.5, -0.5, 1.0], [span * 0.5, -0.5, 1.0],
                          [0.0, 0.5, 1.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    p2f, _, _ = rasterize_mesh(verts, faces, (H, W))
    cover = np.asarray(p2f)[0] >= 0

    xs = np.linspace(-span, span, W)
    ys = np.linspace(-1, 1, H)
    gx, gy = np.meshgrid(xs, ys)
    a, b, c = np.asarray(verts)[0, :, :2]
    # manual point-in-triangle
    def edge(p0, p1, x, y):
        return (p1[0] - p0[0]) * (y - p0[1]) - (p1[1] - p0[1]) * (x - p0[0])
    e0 = edge(a, b, gx, gy)
    e1 = edge(b, c, gx, gy)
    e2 = edge(c, a, gx, gy)
    inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    # allow boundary-pixel disagreement
    disagree = (cover != inside).sum()
    assert disagree <= 0.02 * cover.size + 8


def test_binned_matches_dense():
    """The production tile-binned rasterizer must agree with the dense
    z-buffer oracle on a nontrivial mesh."""
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.ops.rasterize import rasterize_mesh_binned

    model = synthetic_smpl_model(seed=3, num_verts=128, num_faces=256)
    verts = jnp.asarray(model.v_template)[None] * 1.2  # (1, V, 3)
    # give z some spread so the z-test matters
    z = 1.5 + 0.3 * (verts[..., 2] - verts[..., 2].min())
    verts_screen = jnp.concatenate([verts[..., :2], z[..., None]], axis=-1)
    faces = jnp.asarray(model.faces, jnp.int32)

    H, W = 64, 32
    p_dense, b_dense, z_dense = rasterize_mesh(verts_screen, faces, (H, W))
    p_bin, b_bin, z_bin = rasterize_mesh_binned(
        verts_screen, faces, (H, W), tile=16, max_faces_per_tile=256)

    np.testing.assert_array_equal(np.asarray(p_bin), np.asarray(p_dense))
    cover = np.asarray(p_dense) >= 0
    np.testing.assert_allclose(
        np.asarray(z_bin)[cover], np.asarray(z_dense)[cover], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b_bin)[cover], np.asarray(b_dense)[cover], rtol=1e-4, atol=1e-5)


def test_binned_truncation_cap():
    """With K smaller than the overlap count the binned rasterizer still
    returns valid (possibly approximate) output, never garbage indices."""
    from threedhumangan_tpu.ops.rasterize import rasterize_mesh_binned

    # 64 stacked triangles all covering the center
    n = 64
    verts = []
    for i in range(n):
        zi = 1.0 + i * 0.01
        verts += [[-0.8, -0.8, zi], [0.8, -0.8, zi], [0.0, 0.9, zi]]
    verts = jnp.asarray(verts)[None]
    faces = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
    p, b, z = rasterize_mesh_binned(verts, faces, (16, 16), tile=8, max_faces_per_tile=8)
    p = np.asarray(p)
    assert ((p >= -1) & (p < n)).all()
    # the kept candidates are the lowest indices, which here are the CLOSEST
    # (z increases with index) -> center pixel must pick face 0
    assert p[0, 8, 8] == 0


def test_pallas_matches_dense():
    """Pallas tile rasterizer (interpret mode) vs the dense z-buffer
    oracle — exact agreement like the XLA binned path."""
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.ops.rasterize import rasterize_mesh_pallas

    model = synthetic_smpl_model(seed=3, num_verts=128, num_faces=256)
    verts = jnp.asarray(model.v_template)[None] * 1.2
    z = 1.5 + 0.3 * (verts[..., 2] - verts[..., 2].min())
    verts_screen = jnp.concatenate([verts[..., :2], z[..., None]], axis=-1)
    verts_screen = jnp.concatenate([verts_screen, verts_screen * 0.9], axis=0)
    faces = jnp.asarray(model.faces, jnp.int32)

    H, W = 64, 32
    p_dense, b_dense, z_dense = rasterize_mesh(verts_screen, faces, (H, W))
    p_pal, b_pal, z_pal = rasterize_mesh_pallas(
        verts_screen, faces, (H, W), tile=16, max_faces_per_tile=256,
        k_chunk=64, interpret=True)

    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_dense))
    cover = np.asarray(p_dense) >= 0
    np.testing.assert_allclose(
        np.asarray(z_pal)[cover], np.asarray(z_dense)[cover], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b_pal)[cover], np.asarray(b_dense)[cover], rtol=1e-4,
        atol=1e-5)
