"""The REAL DensePose asset (datasets/densepose_data.json — vendored data
table, byte-identical to the reference's) must drive the rasterized
segmentation labels whenever the SMPL topology matches, exactly as
reference ``lib/data/preprocessor.py:186-192`` composes it, including the
13,776-face -> 13,774-face index mapping."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.data.preprocessor import get_preprocessor, load_face_labels
from threedhumangan_tpu.models.smpl import synthetic_smpl_model

REPO = os.path.normpath(os.path.join(os.path.dirname(__file__), ".."))
ASSET = os.path.join(REPO, "datasets", "densepose_data.json")


@pytest.fixture(scope="module")
def table():
    with open(ASSET) as f:
        return json.load(f)


def test_asset_shapes(table):
    """The two-table size mismatch the reference handles: 13,776 smpl faces
    map into 13,774 densepose faces; every index must be in range."""
    s2d = np.asarray(table["smpl_faces_to_densepose_faces"])
    d2l = np.asarray(table["densepose_faces_to_labels"])
    assert s2d.shape == (13776,)
    assert d2l.shape == (13774,)
    assert s2d.min() >= 0 and s2d.max() < len(d2l)
    assert d2l.min() == 0 and d2l.max() == 23  # 24 body parts


def test_real_table_loaded_for_smpl_topology(table):
    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    labels = load_face_labels(smpl.faces)
    s2d = np.asarray(table["smpl_faces_to_densepose_faces"], np.int64)
    d2l = np.asarray(table["densepose_faces_to_labels"], np.int64)
    np.testing.assert_array_equal(labels, d2l[s2d])
    # the real 24-class distribution, not the synthetic binning
    hist = np.bincount(labels, minlength=24)
    assert (hist > 0).all(), hist


def test_tiny_mesh_falls_back_to_synthetic_binning():
    """The table only applies to the real SMPL topology — a 64-face test
    mesh keeps the height-binned pseudo-labels even with the asset present."""
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    labels = load_face_labels(smpl.faces)
    np.testing.assert_array_equal(labels, np.arange(64) * 24 // 64)


def test_explicit_path_with_wrong_topology_raises():
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    with pytest.raises(ValueError, match="13776"):
        load_face_labels(smpl.faces, densepose_path=ASSET)


def test_rasterized_segments_use_real_labels():
    """End-to-end: preprocess a batch with the full SMPL topology and check
    the rasterized segment image uses the real body-part palette
    (bg=1, parts=label+2 in [2, 25] — ref preprocessor.py:170-174)."""
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches

    meta = dict(configs.extract_metadata(configs.MAP3DBN_TINY, 0))
    smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = {k: jnp.asarray(v) for k, v in
             next(iterate_batches(ds, 2, shuffle=False)).items()}
    cond = pre(batch, rotate=False, rng=jax.random.PRNGKey(0))
    seg = np.asarray(cond["rasterized_segments"])
    assert seg.min() >= 1 and seg.max() <= 25
    body = seg[seg > 1]
    assert body.size > 0  # the body is visible
    # several distinct real part labels appear on the rendered body
    assert len(np.unique(body)) >= 5, np.unique(body)


def test_balanced_ce_over_real_class_distribution(table, rng):
    """The 26-class balanced segmentation CE (ref phase_trainer.py:228-241)
    against GT labels drawn from the REAL part distribution: finite, and
    reweighting upweights rare parts vs plain CE."""
    from threedhumangan_tpu.trainers.losses import segmentation_loss

    s2d = np.asarray(table["smpl_faces_to_densepose_faces"], np.int64)
    d2l = np.asarray(table["densepose_faces_to_labels"], np.int64)
    face_labels = d2l[s2d] + 2  # image palette: 0=fake, 1=bg, 2..25=parts
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (2, 16, 16), 0, len(face_labels))
    gt = jnp.asarray(face_labels)[idx]
    # make a quarter of the pixels background
    gt = jnp.where(jax.random.uniform(k2, gt.shape) < 0.25, 1, gt)
    logits = jax.random.normal(rng, (2, 16, 16, 26))

    bal, acc, real_p = segmentation_loss(logits, gt, 26, "cross_entropy_balanced")
    plain, _, _ = segmentation_loss(logits, gt, 26, "cross_entropy")
    assert np.isfinite(float(bal)) and np.isfinite(float(plain))
    assert float(bal) != float(plain)
    assert 0.0 <= float(acc) <= 1.0 and 0.0 <= float(real_p) <= 1.0
