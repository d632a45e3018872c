"""Real SHHQ data path driven end-to-end from an on-disk fixture tree
(VERDICT round-2 item #5): PNG images/masks/body_seg, npy inversions, and
pickle VIBE-style SMPL predictions in the reference directory layout
(ref lib/data/datasets.py:240-320), through SHHQDataset -> preprocessor ->
generator -> one train step, for both coordinate modes."""

import os
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import (
    SHHQDataset,
    iterate_batches,
    make_dataset,
)
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.smpl import batch_rodrigues, synthetic_smpl_model

N_ITEMS = 4


def _meta(**over):
    meta = dict(configs.extract_metadata(configs.MAP3DBN_NANO, 0))
    meta.update(dataset_length=N_ITEMS, **over)
    return meta


@pytest.fixture(scope="module")
def smpl():
    return synthetic_smpl_model(num_verts=96, num_faces=64)


@pytest.fixture(scope="module")
def shhq_tree(tmp_path_factory, smpl):
    """Write a 4-item SHHQ-layout tree with the reference's file naming
    (1-indexed %06d, ref datasets.py:289-307)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("shhq")
    meta = _meta()
    H, W = meta["gen_height"], meta["gen_width"]
    for sub in ("images", "masks", "body_seg", "inversions", "smpl"):
        os.makedirs(root / sub)

    rs = np.random.RandomState(7)
    J = smpl.num_joints
    for i in range(1, N_ITEMS + 1):
        img = rs.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:06d}.png")
        mask = (rs.rand(H * 2, W * 2) > 0.3).astype(np.uint8) * 255
        Image.fromarray(mask).save(root / "masks" / f"{i:06d}.png")
        seg = rs.randint(0, 24, (H * 2, W * 2), np.uint8)
        Image.fromarray(seg).save(root / "body_seg" / f"{i:06d}.png")
        np.save(root / "inversions" / f"{i:06d}.npy",
                rs.randn(meta["latent_dim"]).astype(np.float32))

        # VIBE-style prediction dict (key space: ref datasets.py:117-155)
        aa = 0.2 * rs.randn(J, 3).astype(np.float32)
        rot = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]
        betas = 0.3 * rs.randn(1, 10).astype(np.float32)
        out = smpl.forward(jnp.asarray(betas), jnp.asarray(rot[None]),
                           pose2rot=False)
        pred = {
            "orig_cam": np.asarray([[1.7, 1.7, 0.05, -0.02]], np.float32),
            "joints": np.asarray(out["joints"]),
            "full_pose": np.broadcast_to(rot[None], (1, J, 3, 3)).copy(),
            "tpose_vertices": np.asarray(out["tpose_vertices"]),
            "fk_matrices": np.asarray(out["fk_matrices"]),
            "lbs_weights": np.asarray(smpl.lbs_weights),
            "betas": betas,
        }
        with open(root / "smpl" / f"{i:06d}.pkl", "wb") as f:
            pickle.dump(pred, f)
    return str(root)


def test_getitem_loads_all_modalities(shhq_tree, smpl):
    meta = _meta(dataroot=shhq_tree, joints=list(range(smpl.num_joints)))
    ds = SHHQDataset(smpl_model=smpl, **{k: v for k, v in meta.items()
                                         if k not in ("dataset", "name", "batch_size")})
    item = ds[0]
    H, W = meta["gen_height"], meta["gen_width"]
    assert item["images"].shape == (H, W, 3)
    assert item["images"].min() >= -1.0 and item["images"].max() <= 1.0
    # background (mask==0) painted white (ref :298)
    m = np.asarray(item["masks"])
    mask = (m if m.ndim == 2 else m[..., 0]) < 0
    if mask.any():
        np.testing.assert_allclose(item["images"][mask], 1.0, atol=1e-5)
    # segment labels shifted: 0 reserved for fake, 1 = background
    assert item["body_segments"].min() >= 1
    assert item["latents"].shape == (meta["latent_dim"],)
    # SMPL condition fields from the pkl
    assert item["vertices"].shape == (smpl.num_verts, 3)
    assert item["fk_matrices"].shape == (smpl.num_joints, 4, 4)
    assert np.isfinite(item["vertices"]).all()


def test_make_dataset_selects_real_tree(shhq_tree, smpl):
    meta = _meta(dataroot=shhq_tree, joints=list(range(smpl.num_joints)))
    ds = make_dataset("SHHQDataset", smpl_model=smpl, **meta)
    assert isinstance(ds, SHHQDataset)


def test_get_all_latents_bulk_load(shhq_tree, smpl):
    meta = _meta(dataroot=shhq_tree, joints=list(range(smpl.num_joints)))
    ds = SHHQDataset(smpl_model=smpl, **{k: v for k, v in meta.items()
                                         if k not in ("dataset", "name", "batch_size")})
    lat = ds.get_all_latents()
    assert lat.shape == (N_ITEMS, meta["latent_dim"])
    # x2 scaling of the stored inversion (ref :289)
    stored = np.load(os.path.join(shhq_tree, "inversions", "000001.npy"))
    np.testing.assert_allclose(lat[0], 2 * stored[: meta["latent_dim"]], rtol=1e-6)


def test_corrupted_skip(shhq_tree, smpl):
    meta = _meta(dataroot=shhq_tree, joints=list(range(smpl.num_joints)))
    ds = SHHQDataset(smpl_model=smpl, **{k: v for k, v in meta.items()
                                         if k not in ("dataset", "name", "batch_size")})
    ds.corrupted = [0]
    a = ds[0]
    b = ds[1]
    assert a["indices"] == b["indices"] == 1


@pytest.mark.parametrize("mode", ["fix_body", "fix_camera"])
def test_real_tree_through_generator(shhq_tree, smpl, mode):
    """fixture tree -> SHHQDataset -> preprocessor -> generator forward."""
    from threedhumangan_tpu.models.generator import generator_forward, init_generator

    meta = _meta(dataroot=shhq_tree, joints=list(range(smpl.num_joints)),
                 coordinate_mode=mode, nerf_noise=0.0, perturb_rays=False)
    ds = SHHQDataset(smpl_model=smpl, **{k: v for k, v in meta.items()
                                         if k not in ("dataset", "name", "batch_size")})
    batch = next(iterate_batches(ds, 2, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = get_preprocessor(meta, smpl_model=smpl)
    rng = jax.random.PRNGKey(0)
    cond = pre(batch, rotate=False, rng=rng)
    assert np.isfinite(np.asarray(cond["vertices"])).all()

    params, state = init_generator(rng, meta)
    z = jax.random.normal(rng, (2, meta["latent_dim"]))
    out, _ = generator_forward(params, state, z, cond, rng, meta, train=False)
    assert out["rgbs"].shape == (2, meta["gen_height"], meta["gen_width"], 3)
    assert np.isfinite(np.asarray(out["rgbs"])).all()


@pytest.mark.slow
def test_real_tree_one_train_step(shhq_tree, smpl):
    """One full D+G step from the on-disk tree (fix_body, the shipped
    mode), exercising images/segments/latents as real training data."""
    import types

    from threedhumangan_tpu.trainers.base_trainer import Trainer

    cfg = dict(configs.MAP3DBN_NANO)
    cfg["name"] = "shhq_fixture_train"
    cfg["dataroot"] = shhq_tree
    cfg["dataset"] = "SHHQDataset"
    cfg["dataset_length"] = N_ITEMS
    cfg["joints"] = list(range(smpl.num_joints))
    opt = types.SimpleNamespace(
        output_dir=shhq_tree + "_out", n_epochs=1, sample_interval=0,
        model_save_interval=10, model_keep_interval=10, bs_factor=1, seed=0)
    trainer = Trainer(0, 1, opt, cfg, smpl_model=smpl)
    assert isinstance(trainer.dataset, SHHQDataset)
    # latent pool initialized from the on-disk inversions (x2 scaling)
    stored = np.load(os.path.join(shhq_tree, "inversions", "000001.npy"))
    np.testing.assert_allclose(
        np.asarray(trainer.ts.params_G["latent_pool"][0]),
        2 * stored[: cfg["latent_dim"]], rtol=1e-5)
    trainer.run(max_steps=1)
    assert trainer.step == 1
    assert np.isfinite(
        np.asarray(trainer.ts.params_D["output_layer"]["w"])).all()
