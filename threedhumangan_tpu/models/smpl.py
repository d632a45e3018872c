"""SMPL body model: linear blend skinning + per-point geometric features.

Behavioural parity with reference ``lib/components/smpl.py``:
  lbs()               (ref smpl.py:11-107, itself re-stating smplx.lbs)
  SMPLModel.forward   (ref smpl.py:116-207 — returns fk_matrices,
                       tpose_vertices, lbs_weights alongside verts/joints)
  get_geo_features()  (ref smpl.py:210-249 — the 31-d conditioning: 24 joint
                       distances, 3 inverse-LBS canonicalized coords, 3
                       nearest T-pose vertex coords, 1 surface distance)

TPU-first notes: the kinematic chain is unrolled at trace time (24 static
joints); KNN is the brute-force MXU matmul from ops.knn (replacing pytorch3d
CUDA knn_points, the reference's hottest native dependency); fk-matrix
inversion happens once per batch item, not per point.

The model constants load from a standard SMPL pickle when available;
``synthetic_smpl_model`` provides shape-compatible random constants so tests
and benches never require the (non-redistributable) asset.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu.ops.knn import knn_gather, knn_points

NUM_JOINTS = 24
NUM_VERTS = 6890
NUM_FACES = 13776


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------


def batch_rodrigues(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    angle = jnp.linalg.norm(aa + eps, axis=-1, keepdims=True)  # (..., 1)
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(*aa.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=aa.dtype)
    outer = axis[..., :, None] * axis[..., None, :]
    return cos * ident + (1 - cos) * outer + sin * K


def euler_angles_to_matrix_xyz(euler: jax.Array) -> jax.Array:
    """XYZ-convention euler angles (B, 3) -> (B, 3, 3), matching
    pytorch3d.transforms.euler_angles_to_matrix(convention='XYZ')
    (used by the preprocessor, ref preprocessor.py:86)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rx = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1).reshape(*x.shape, 3, 3)
    ry = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1).reshape(*x.shape, 3, 3)
    rz = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1).reshape(*x.shape, 3, 3)
    return rx @ ry @ rz


# ---------------------------------------------------------------------------
# LBS
# ---------------------------------------------------------------------------


def blend_shapes(betas: jax.Array, shapedirs: jax.Array) -> jax.Array:
    """(B, n_betas) x (V, 3, n_betas) -> (B, V, 3)."""
    return jnp.einsum("bl,vdl->bvd", betas, shapedirs)


def vertices2joints(J_regressor: jax.Array, verts: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvd->bjd", J_regressor, verts)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: np.ndarray
) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics along the (static) kinematic tree.

    rot_mats: (B, J, 3, 3); joints: (B, J, 3); parents: numpy (J,) int.
    Returns (posed_joints (B,J,3), rel_transforms (B,J,4,4)), matching
    smplx.lbs.batch_rigid_transform.  The chain loop unrolls at trace time.
    """
    B, J = joints.shape[:2]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, np.asarray(parents[1:])]], axis=1
    )

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # (B, 3, 4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)  # (B, 4, 4)

    transforms = [make_T(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        local = make_T(rot_mats[:, j], rel_joints[:, j])
        transforms.append(jnp.einsum("bij,bjk->bik", transforms[int(parents[j])], local))
    chain = jnp.stack(transforms, axis=1)  # (B, J, 4, 4)

    posed_joints = chain[:, :, :3, 3]
    # remove the rest-pose joint location from the transform (A maps
    # rest-pose space to posed space)
    joints_homo = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum("bjik,bjk->bji", chain, joints_homo)  # (B, J, 4)
    rel = chain - jnp.concatenate(
        [jnp.zeros((B, J, 4, 3), chain.dtype), correction[..., None]], axis=-1
    )
    return posed_joints, rel


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: np.ndarray,
    lbs_weights: jax.Array,
    pose2rot: bool = True,
):
    """Linear blend skinning (ref smpl.py:11-107).

    Returns (A, v_shaped, verts, J, J_transformed) exactly as the reference.
    """
    B = max(betas.shape[0], pose.shape[0])
    V = v_template.shape[0]
    J = J_regressor.shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)

    ident = jnp.eye(3, dtype=betas.dtype)
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(B, -1, 3)).reshape(B, -1, 3, 3)
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = jnp.matmul(pose_feature, posedirs).reshape(B, V, 3)

    v_posed = v_shaped + pose_offsets
    J_transformed, A = batch_rigid_transform(rot_mats, joints, parents)

    T = jnp.einsum("vj,bjkl->bvkl", lbs_weights, A)  # (B, V, 4, 4)
    v_homo = jnp.concatenate([v_posed, jnp.ones((B, V, 1), v_posed.dtype)], axis=-1)
    verts = jnp.einsum("bvij,bvj->bvi", T, v_homo)[..., :3]

    return A, v_shaped, verts, joints, J_transformed


# ---------------------------------------------------------------------------
# model constants
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SMPLModel:
    """Immutable SMPL constants (the reference wraps smplx.SMPL; here the
    constants are plain arrays so everything stays functional)."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, n_betas)
    posedirs: jax.Array  # ((J-1)*9, V*3)
    J_regressor: jax.Array  # (J, V)
    parents: np.ndarray  # (J,) static
    lbs_weights: jax.Array  # (V, J)
    faces: np.ndarray  # (F, 3) static

    @property
    def num_verts(self):
        return self.v_template.shape[0]

    @property
    def num_joints(self):
        return self.J_regressor.shape[0]

    def forward(self, betas: jax.Array, full_pose: jax.Array, pose2rot: bool = True) -> dict:
        """Pose the model; returns the dict the reference's SMPL.forward
        returns (ref smpl.py:194-205), minus torch-specific fields."""
        A, v_shaped, verts, joints_shaped, joints = lbs(
            betas, full_pose, self.v_template, self.shapedirs, self.posedirs,
            self.J_regressor, self.parents, self.lbs_weights, pose2rot=pose2rot,
        )
        return {
            "fk_matrices": A,
            "tpose_vertices": v_shaped,
            "vertices": verts,
            "joints_shaped": joints_shaped,
            "joints": joints,
            "betas": betas,
            "full_pose": full_pose,
            "lbs_weights": self.lbs_weights,
        }


def load_smpl_model(path: str) -> SMPLModel:
    """Load SMPL constants from the standard SMPL_NEUTRAL.pkl layout."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def to_np(x):
        if hasattr(x, "todense"):
            return np.asarray(x.todense())
        try:
            import scipy.sparse  # noqa: F401

            if hasattr(x, "toarray"):
                return np.asarray(x.toarray())
        except Exception:
            pass
        return np.asarray(x)

    posedirs = np.asarray(data["posedirs"], np.float32)  # (V, 3, P)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (P, V*3)

    return SMPLModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(np.asarray(data["shapedirs"])[:, :, :10], jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(to_np(data["J_regressor"]), jnp.float32),
        parents=np.asarray(data["kintree_table"][0], np.int64).clip(0),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        faces=np.asarray(data["f"], np.int64),
    )


def synthetic_smpl_model(
    seed: int = 0, num_verts: int = 384, num_faces: int = 512, num_joints: int = NUM_JOINTS
) -> SMPLModel:
    """Random, shape-compatible stand-in for tests/benches without the asset.

    A crude "body": vertices on a vertical capsule, joints spread along the
    spine, smooth skinning weights by joint proximity.
    """
    rs = np.random.RandomState(seed)

    # structured cylinder mesh (rows x cols grid): local faces with small
    # screen-space bounding boxes, matching real body-mesh topology (random
    # vertex triples would make every face span the whole body, which is
    # pathological for the tile-binned rasterizer and unlike any real mesh)
    cols = max(8, int(np.sqrt(num_verts / 2)))
    rows = max(2, num_verts // cols)
    num_verts = rows * cols
    theta = np.tile(np.linspace(0, 2 * np.pi, cols, endpoint=False), rows)
    height = np.repeat(np.linspace(-0.9, 0.9, rows), cols)
    radius = 0.25 + 0.02 * rs.randn(num_verts)
    v_template = np.stack(
        [radius * np.cos(theta), height, radius * np.sin(theta)], axis=-1
    ).astype(np.float32)

    parents = np.zeros(num_joints, np.int64)
    for j in range(1, num_joints):
        parents[j] = rs.randint(0, j)

    joint_y = np.linspace(-0.8, 0.8, num_joints)
    joint_pos = np.stack([np.zeros(num_joints), joint_y, np.zeros(num_joints)], -1)

    # J_regressor: soft-assign each joint to nearby vertices
    d = ((v_template[None, :, :] - joint_pos[:, None, :]) ** 2).sum(-1)
    J_regressor = np.exp(-d / 0.05)
    J_regressor = J_regressor / J_regressor.sum(axis=1, keepdims=True)

    w = np.exp(-d.T / 0.1)  # (V, J)
    lbs_weights = w / w.sum(axis=1, keepdims=True)

    # two triangles per grid quad (wrapping around the cylinder)
    quads = []
    for r in range(rows - 1):
        for c in range(cols):
            v00 = r * cols + c
            v01 = r * cols + (c + 1) % cols
            v10 = (r + 1) * cols + c
            v11 = (r + 1) * cols + (c + 1) % cols
            quads.append([v00, v01, v10])
            quads.append([v01, v11, v10])
    faces = np.asarray(quads, np.int64)
    if len(faces) >= num_faces:
        faces = faces[:num_faces]
    else:  # pad by repeating (degenerate duplicates are harmless)
        reps = -(-num_faces // len(faces))
        faces = np.tile(faces, (reps, 1))[:num_faces]

    n_betas = 10
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(0.01 * rs.randn(num_verts, 3, n_betas), jnp.float32),
        posedirs=jnp.asarray(
            0.001 * rs.randn((num_joints - 1) * 9, num_verts * 3), jnp.float32
        ),
        J_regressor=jnp.asarray(J_regressor, jnp.float32),
        parents=parents,
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        faces=faces,
    )


def get_smpl_model(path: Optional[str] = None) -> SMPLModel:
    """Load the real asset when present, else the synthetic stand-in."""
    candidates = [path] if path else []
    candidates += ["./datasets/SMPL_NEUTRAL.pkl", "/root/repo/datasets/SMPL_NEUTRAL.pkl"]
    for c in candidates:
        if c and os.path.exists(c):
            return load_smpl_model(c)
    return synthetic_smpl_model()


# ---------------------------------------------------------------------------
# geometric conditioning features
# ---------------------------------------------------------------------------


def get_geo_features(
    points: jax.Array,
    skeletons: jax.Array,
    vertices: jax.Array,
    tpose_vertices: jax.Array,
    fk_matrices: jax.Array,
    lbs_weights: jax.Array,
    legacy_mode: bool = False,
    use_pallas_knn: bool = False,
    use_pallas_geo: bool = False,
    geo_tile_points: int | None = None,  # None -> auto_geo_tile (VMEM fit)
    interpret: bool = False,
) -> jax.Array:
    """Per-point 31-d geometric conditioning (ref smpl.py:210-249).

    points: (B, P, 3); skeletons: (B, J, 3); vertices: (B, V, 3);
    tpose_vertices: (B, V, 3); fk_matrices: (B, J, 4, 4);
    lbs_weights: (B, V, J).

    ``use_pallas_knn`` switches the 1-NN search to the fused Pallas kernel
    (ops/knn.nn_points_pallas) — safe even in training because the reference
    computes geo features under no_grad (ref map3d_generator.py:196).

    ``use_pallas_geo`` runs the ENTIRE stage (1-NN + gather + inverse-FK
    canonicalization + joint distances) as one vertex-major Pallas kernel
    (ops/geo.py) — gathers never touch the TPU scalar unit.
    """
    B, P, _ = points.shape
    V = vertices.shape[1]

    if use_pallas_geo:
        from threedhumangan_tpu.ops.geo import (
            build_vertex_features, geo_features_pallas)

        vfeat = build_vertex_features(tpose_vertices, fk_matrices, lbs_weights)
        return geo_features_pallas(points, vertices, vfeat, skeletons,
                                   legacy_mode=legacy_mode,
                                   tile_points=geo_tile_points,
                                   interpret=interpret)

    # joint distances, normalized (ref :216)
    diff = points[:, :, None, :] - skeletons[:, None, :, :]
    joint_dists = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12) / 2.4  # (B,P,J)

    # per-vertex inverse FK, blended by skinning weights (ref :217-218)
    ik_matrices = jnp.linalg.inv(fk_matrices.astype(jnp.float32))  # (B, J, 4, 4)
    vertex_ik = jnp.einsum("bvj,bjkl->bvkl", lbs_weights, ik_matrices)  # (B,V,4,4)

    if use_pallas_knn:
        from threedhumangan_tpu.ops.knn import nn_points_pallas

        nearest_d2, nearest_idx = nn_points_pallas(
            points.astype(jnp.float32), vertices.astype(jnp.float32))
    else:
        nearest_d2, nearest_idx = knn_points(
            points.astype(jnp.float32), vertices.astype(jnp.float32), k=1
        )

    point_ik = knn_gather(vertex_ik.reshape(B, V, 16), nearest_idx)  # (B,P,1,16)
    point_ik = point_ik[:, :, 0].reshape(B, P, 4, 4)

    points_homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    cano = jnp.einsum("bpij,bpj->bpi", point_ik, points_homo)[..., :3]
    cano = jnp.stack(
        [cano[..., 0] / 2.0, (cano[..., 1] + 0.2) / 2.0, cano[..., 2] / 1.3], axis=-1
    )

    cano_vertices = knn_gather(tpose_vertices, nearest_idx)[:, :, 0]  # (B,P,3)
    cano_vertices = cano_vertices.at[..., 2].divide(0.2)

    nearest_dists = jnp.sqrt(nearest_d2[:, :, :1]) / 1.3  # (B,P,1)

    if legacy_mode:
        return jnp.concatenate([joint_dists, cano, cano_vertices, nearest_dists], axis=-1)
    return jnp.concatenate([cano, joint_dists, cano_vertices, nearest_dists], axis=-1)
