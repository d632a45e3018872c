"""Host-side datasets: SHHQ-style directory loader + synthetic fallback.

Behavioural parity with reference ``lib/data/datasets.py`` (SHHQDataset):
  * per-index loads images/, masks/ (background -> white, ref :298),
    body_seg/ (labels shifted: 0=fake, 1=bg, 2..=parts, ref :305-309),
    inversions/*.npy (x2-scaled latents, ref :289), smpl/*.pkl (VIBE dict);
  * ``preprocess_smpl`` fix_body canonicalization (ref :117-181): fold
    ``Rx(pi) @ inverse_root`` into the FK matrices, re-skin vertices, build
    the weak-perspective camera from orig_cam;
  * corrupted-index skip list (ref :29, 274-277);
  * ``get_all_latents`` bulk-load (ref :64-89).

The reference's off-by-design bugs are fixed, not replicated: image loading
inside the corrupted-skip while loop (`_get_item_image_only`, ref bug #5 in
SURVEY.md §5) and the uninitialized ceph branch (bug #7).

``SyntheticSHHQDataset`` generates geometrically consistent conditions from
the synthetic SMPL model so the full train/inference path runs with zero
assets (tests, benches, smoke runs).

TPU note: this layer is host-side numpy by design — conditioning tensors are
small; the heavy work (rasterization, rendering) happens on device in the
preprocessor.  Batches are contiguous numpy dicts ready for a single
host->device transfer.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional

import numpy as np

from threedhumangan_tpu.models.smpl import SMPLModel, get_smpl_model

FOV = np.pi * 12 / 180
FOCAL = 1.0 / np.tan(FOV / 2)


def _rx_pi() -> np.ndarray:
    """Rotation of pi about x (the dataset's cano_rotation, ref :146)."""
    return np.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], np.float32)


def preprocess_smpl_fix_body(
    pred: Dict, joints: List[int], smpl_tpose_vertices: np.ndarray,
    inference: bool = False,
) -> Dict:
    """Canonicalize one VIBE-style SMPL prediction (ref :117-181)."""
    sx, sy, tx, ty = np.asarray(pred["orig_cam"][0], np.float32)
    sx = sx / 2.0
    skeleton_xyz = np.asarray(pred["joints"][0], np.float32)[joints]

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = FOCAL
    R = np.eye(4, dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3], T[1, 3], T[2, 3] = tx, ty, FOCAL / sx

    body_pose = np.asarray(pred["full_pose"][0], np.float32)  # (J, 3, 3)
    tpose_vertices_shaped = np.asarray(pred["tpose_vertices"][0], np.float32)
    fk_matrices = np.asarray(pred["fk_matrices"][0], np.float32)  # (J, 4, 4)

    inverse_root = np.linalg.inv(body_pose[0])
    cano_matrix = np.eye(4, dtype=np.float32)
    cano_matrix[:3, :3] = _rx_pi() @ inverse_root
    fk_matrices = np.einsum("ij,bjk->bik", cano_matrix, fk_matrices)

    lbs_weights = np.asarray(pred["lbs_weights"], np.float32)  # (V, J)
    vert_fk = np.einsum("vj,jkl->vkl", lbs_weights, fk_matrices)
    tpose_homo = np.concatenate(
        [tpose_vertices_shaped, np.ones_like(tpose_vertices_shaped[:, :1])], axis=-1)
    vertices = np.einsum("vij,vj->vi", vert_fk, tpose_homo)[:, :3]

    skel_homo = np.concatenate([skeleton_xyz, np.ones_like(skeleton_xyz[:, :1])], -1)
    skeleton_xyz = (cano_matrix @ skel_homo.T).T[:, :3]

    tpose_vertices = np.asarray(smpl_tpose_vertices, np.float32).copy()
    tpose_vertices[..., 1] += 0.35  # ref :213-214

    out = {
        "scales": np.float32(sx),
        "skeletons_xyz": skeleton_xyz.astype(np.float32),
        "intrinsics": K,
        "vertices": vertices.astype(np.float32),
        "tpose_vertices": tpose_vertices,
        "full_pose": body_pose,
        "fk_matrices": fk_matrices.astype(np.float32),
        "lbs_weights": lbs_weights,
        "cano_matrices": cano_matrix,
        "R": R,
        "T": T,
    }
    if inference:
        out["body_shape"] = np.asarray(pred["betas"][0], np.float32)
    return out


def preprocess_smpl_fix_camera(
    pred: Dict, joints: List[int], smpl_tpose_vertices: np.ndarray,
    inference: bool = False,
) -> Dict:
    """fix_camera variant: body stays posed, camera is fixed (ref :183-235)."""
    sx, sy, tx, ty = np.asarray(pred["orig_cam"][0], np.float32)
    sx = sx / 2.0
    skeleton_xyz = np.asarray(pred["joints"][0], np.float32)[joints]

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = FOCAL
    R = np.eye(4, dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3], T[1, 3], T[2, 3] = tx, ty, FOCAL / sx

    world2cam = R @ T
    cam2world = np.linalg.inv(world2cam)

    tpose_vertices = np.asarray(smpl_tpose_vertices, np.float32).copy()
    tpose_vertices[..., 1] += 0.35

    out = {
        "scales": np.float32(sx),
        "skeletons_xyz": skeleton_xyz.astype(np.float32),
        "intrinsics": K,
        "tpose_vertices": tpose_vertices,
        "tpose_vertices_shaped": np.asarray(pred["tpose_vertices"][0], np.float32),
        "full_pose": np.asarray(pred["full_pose"][0], np.float32),
        "fk_matrices": np.asarray(pred["fk_matrices"][0], np.float32),
        "lbs_weights": np.asarray(pred["lbs_weights"], np.float32),
        "cam2world_matrices": cam2world.astype(np.float32),
        "R": R,
        "T": T,
    }
    if inference:
        out["body_shape"] = np.asarray(pred["betas"][0], np.float32)
    return out


def preprocess_smpl(pred, joints, smpl_tpose_vertices, coordinate_mode="fix_body",
                    inference=False):
    """Dispatch by coordinate_mode (ref preprocess_smpl :107-114)."""
    if coordinate_mode == "fix_body":
        return preprocess_smpl_fix_body(pred, joints, smpl_tpose_vertices, inference)
    if coordinate_mode == "fix_camera":
        return preprocess_smpl_fix_camera(pred, joints, smpl_tpose_vertices, inference)
    raise NotImplementedError(coordinate_mode)


class SHHQDataset:
    """Directory-layout loader (ref :27-320)."""

    corrupted = [118464]

    def __init__(self, **kwargs):
        self.root = kwargs["dataroot"]
        self.length = kwargs["dataset_length"]
        self.height = kwargs["gen_height"]
        self.width = kwargs["gen_width"]
        self.joints = list(kwargs.get("joints", []))
        self.latent_dim = kwargs["latent_dim"]
        self.inference = kwargs.get("inference", False)
        self.image_only = kwargs.get("image_only", False)
        self.condition_only = kwargs.get("condition_only", False)
        self.coordinate_mode = kwargs.get("coordinate_mode", "fix_body")
        self.smpl_model: SMPLModel = kwargs.get("smpl_model") or get_smpl_model(
            os.path.join("datasets", "SMPL_NEUTRAL.pkl"))
        self.smpl_tpose_vertices = np.asarray(self.smpl_model.v_template)

    def __len__(self):
        return self.length

    # -- IO helpers ----------------------------------------------------------

    def _load_image(self, path, nearest=False):
        from PIL import Image

        from threedhumangan_tpu.data.native import resize_u8

        img = np.asarray(Image.open(path))
        return resize_u8(img, self.height, self.width, nearest=nearest)

    def _skip_corrupted(self, index):
        while index in self.corrupted:
            index = (index + 1) % len(self)
        return index

    def get_all_latents(self) -> np.ndarray:
        """(ref :64-89): x2-scaled inversion latents for LatentPool init."""
        latents = np.zeros([len(self), self.latent_dim], np.float32)
        for i in range(len(self)):
            p = os.path.join(self.root, "inversions", f"{i + 1:06d}.npy")
            if os.path.exists(p):
                latents[i] = 2 * np.load(p)[: self.latent_dim]
        return latents

    # -- items ----------------------------------------------------------------

    def _load_smpl(self, index):
        p = os.path.join(self.root, "smpl", f"{index + 1:06d}.pkl")
        try:
            import joblib

            pred = joblib.load(p)
        except Exception:
            with open(p, "rb") as f:
                pred = pickle.load(f)
        return preprocess_smpl(
            pred, self.joints, self.smpl_tpose_vertices,
            self.coordinate_mode, self.inference)

    def __getitem__(self, index) -> Dict:
        index = self._skip_corrupted(index)

        if self.condition_only:
            return self._load_smpl(index)

        from threedhumangan_tpu.data.native import normalize_masked_image

        rgb = self._load_image(os.path.join(self.root, "images", f"{index + 1:06d}.png"))
        mask = self._load_image(os.path.join(self.root, "masks", f"{index + 1:06d}.png"), nearest=True)
        mask2d = mask if mask.ndim == 2 else mask[..., 0]
        # white background + [-1, 1] normalization (ref :298) via the native core
        images = normalize_masked_image(rgb, mask2d)

        data = {"indices": np.int32(index), "images": images,
                "masks": (mask.astype(np.float32) / 127.5 - 1.0)}

        lat_path = os.path.join(self.root, "inversions", f"{index + 1:06d}.npy")
        if os.path.exists(lat_path):
            data["latents"] = (2 * np.load(lat_path)[: self.latent_dim]).astype(np.float32)
        else:
            data["latents"] = np.zeros([self.latent_dim], np.float32)

        if self.image_only:
            return data

        from threedhumangan_tpu.data.native import shift_segment_labels

        seg = self._load_image(os.path.join(self.root, "body_seg", f"{index + 1:06d}.png"), nearest=True)
        if seg.ndim == 3:
            seg = seg[..., 0]
        # 0 reserved for "fake", 1 for background (ref :305-309)
        data["body_segments"] = shift_segment_labels(seg.astype(np.int64))

        if self.joints:
            data.update(self._load_smpl(index))
        return data


class SyntheticSHHQDataset:
    """Asset-free stand-in producing geometrically consistent conditions."""

    def __init__(self, **kwargs):
        self.length = kwargs["dataset_length"]
        self.height = kwargs["gen_height"]
        self.width = kwargs["gen_width"]
        self.joints = list(kwargs.get("joints", []))
        self.latent_dim = kwargs["latent_dim"]
        self.inference = kwargs.get("inference", False)
        self.label_dim = kwargs.get("label_dim", 26)
        self.smpl_model: SMPLModel = kwargs.get("smpl_model") or get_smpl_model()

    def __len__(self):
        return self.length

    def get_all_latents(self) -> np.ndarray:
        rs = np.random.RandomState(1234)
        return rs.randn(len(self), self.latent_dim).astype(np.float32)

    def __getitem__(self, index) -> Dict:
        import jax.numpy as jnp

        rs = np.random.RandomState(index)
        J = self.smpl_model.num_joints

        # mild random pose as rotation matrices (pose2rot=False path)
        aa = 0.2 * rs.randn(J, 3).astype(np.float32)
        from threedhumangan_tpu.models.smpl import batch_rodrigues

        rot = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]  # (J,3,3)
        betas = 0.5 * rs.randn(1, 10).astype(np.float32)
        smpl_out = self.smpl_model.forward(
            jnp.asarray(betas), jnp.asarray(rot[None]), pose2rot=False)

        pred = {
            "orig_cam": np.asarray([[1.8, 1.8, 0.0, 0.0]], np.float32),
            "joints": np.asarray(smpl_out["joints"]),
            "full_pose": np.asarray(
                jnp.broadcast_to(jnp.asarray(rot)[None], (1, J, 3, 3))),
            "tpose_vertices": np.asarray(smpl_out["tpose_vertices"]),
            "fk_matrices": np.asarray(smpl_out["fk_matrices"]),
            "lbs_weights": np.asarray(self.smpl_model.lbs_weights),
            "betas": betas,
        }
        joints_sel = self.joints or list(range(J))
        data = preprocess_smpl_fix_body(
            pred, joints_sel, np.asarray(self.smpl_model.v_template), self.inference)

        data["indices"] = np.int32(index)
        data["latents"] = rs.randn(self.latent_dim).astype(np.float32)
        data["images"] = rs.uniform(-1, 1, (self.height, self.width, 3)).astype(np.float32)
        data["masks"] = np.ones((self.height, self.width, 1), np.float32)
        seg = rs.randint(1, self.label_dim, (self.height, self.width)).astype(np.int64)
        data["body_segments"] = seg
        return data


_DATASETS = {"SHHQDataset": SHHQDataset, "SyntheticSHHQDataset": SyntheticSHHQDataset}


_RESERVED_KEYS = ("name", "dataset", "batch_size", "world_size", "rank", "trainer")


def _clean(meta: dict) -> dict:
    """Config dicts are passed wholesale as **meta (the reference's de-facto
    flag system, SURVEY.md §5) — drop keys that collide with positionals."""
    return {k: v for k, v in meta.items() if k not in _RESERVED_KEYS}


def make_dataset(kind: str, **meta):
    """Resolve by class name; fall back to synthetic when assets are absent.

    The first parameter is deliberately NOT called ``name``/``dataset`` —
    config dicts are passed wholesale as **meta (the reference's de-facto
    flag system) and contain both keys."""
    meta = _clean(meta)
    root = meta.get("dataroot")
    if kind == "SyntheticSHHQDataset" or root in (None, "", "synthetic"):
        return SyntheticSHHQDataset(**meta)
    has_assets = os.path.isdir(os.path.join(root, "images")) or os.path.isdir(
        os.path.join(root, "smpl"))
    if not has_assets:
        return SyntheticSHHQDataset(**meta)
    return _DATASETS[kind](**meta)


def _collate(items: List[Dict]) -> Dict:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def iterate_batches(
    dataset, batch_size: int, *, shuffle: bool = True, seed: int = 0,
    world_size: int = 1, rank: int = 0, drop_last: bool = True,
) -> Iterator[Dict]:
    """One epoch of rank-sharded batches (replaces DistributedSampler +
    DataLoader, ref lib/data/__init__.py:5-38)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    order = order[rank::world_size]
    stop = (len(order) // batch_size) * batch_size if drop_last else len(order)
    for start in range(0, stop, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size and drop_last:
            break
        yield _collate([dataset[int(i)] for i in idx])


def get_dataset(kind: str, batch_size: int = 1, **meta):
    """(ref lib/data/__init__.py:5-20): returns (iterator-factory, dataset)."""
    ds = make_dataset(kind, **_clean(meta))

    def loader(seed: int = 0, shuffle: bool = False):
        return iterate_batches(ds, batch_size, shuffle=shuffle, seed=seed)

    return loader, ds


def get_dataset_distributed(kind: str, world_size: int, rank: int, batch_size: int, **meta):
    """(ref lib/data/__init__.py:23-38)"""
    ds = make_dataset(kind, **_clean(meta))

    def loader(seed: int = 0, shuffle: bool = True):
        return iterate_batches(
            ds, batch_size, shuffle=shuffle, seed=seed, world_size=world_size, rank=rank)

    return loader, ds
