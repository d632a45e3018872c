"""Trainer-loop integration: curriculum, phases, checkpoint save/resume
(ref base_trainer.py run :328-449 + init_model :74-91)."""

import os
import types

import jax
import numpy as np
import pytest

from threedhumangan_tpu import configs
from threedhumangan_tpu.models.smpl import synthetic_smpl_model
from threedhumangan_tpu.trainers.base_trainer import Trainer


def _opt(output_dir, max_steps=None):
    return types.SimpleNamespace(
        output_dir=output_dir, n_epochs=10, sample_interval=1000,
        model_save_interval=2, model_keep_interval=2, bs_factor=1, seed=0)


@pytest.fixture(scope="module")
def tiny_config():
    # NANO: smallest config exercising every subsystem — the trainer loop
    # itself is shape-agnostic and XLA compile time dominates this test
    cfg = dict(configs.MAP3DBN_NANO)
    cfg["name"] = "trainer_test"
    return cfg


@pytest.mark.slow
def test_trainer_runs_and_checkpoints(tmp_path_factory, tiny_config):
    out = str(tmp_path_factory.mktemp("train"))
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    trainer = Trainer(0, 1, _opt(out), tiny_config, smpl_model=smpl)
    # the trainer shards its batch over the mesh (batch 2 -> 2 CPU devices)
    assert trainer.mesh.shape["data"] == 2
    trainer.run(max_steps=2)
    assert trainer.step == 2
    ckpt_dir = os.path.join(out, "trainer_test")
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith("checkpoint.npz")]
    assert ckpts, os.listdir(ckpt_dir)
    # metrics logged (step 1 always logs) incl. the per-group norm scalars
    import json

    with open(os.path.join(ckpt_dir, "metrics.jsonl")) as f:
        entries = [json.loads(line) for line in f]
    assert entries and any("d_loss" in e for e in entries)
    assert any(any(k.startswith("g_grad_norm/") for k in e) for e in entries)
    assert any(any(k.startswith("d_weight_norm/") for k in e) for e in entries)

    # sample grids + D segmentation maps (ref phase_trainer.py log_image)
    trainer.log_image(configs.extract_metadata(tiny_config, trainer.step))
    pngs = os.listdir(ckpt_dir)
    assert any(f.endswith("_ema.png") for f in pngs), pngs
    assert any(f.endswith("_dseg.png") for f in pngs), pngs

    # resume continues from the saved step with identical params
    trainer2 = Trainer(0, 1, _opt(out), tiny_config, smpl_model=smpl)
    assert trainer2.step == 2
    a = np.asarray(trainer.ts.params_D["output_layer"]["w"])
    b = np.asarray(trainer2.ts.params_D["output_layer"]["w"])
    np.testing.assert_array_equal(a, b)

    trainer2.run(max_steps=4)
    assert trainer2.step == 4


@pytest.mark.slow
def test_curriculum_boundaries_lr_and_stage_switch(tmp_path_factory):
    """Drive Trainer.run across (a) an lr-only int-key boundary (the
    reference's 140k-style drop, ref configs/map3d.py:4-6) and (b) a
    batch+resolution boundary that must rebuild the loader/step (ref
    base_trainer.py:344-360), then resume across it."""
    cfg = dict(configs.MAP3DBN_NANO)
    cfg["name"] = "curriculum_test"
    # Like the reference's shipped curricula (configs/map3d.py:4-6), the int
    # keys change batch/lr only: a RESOLUTION change would invalidate the
    # U-Net D's full-size bottleneck latent conv in the reference too (its
    # kernel equals the bottleneck extent, unet_discriminators.py:117-118).
    cfg[0] = {"batch_size": 2, "batch_split": 1, "gen_lr": 1e-4,
              "disc_lr": 4e-4}
    cfg[2] = {"batch_size": 2, "batch_split": 1, "gen_lr": 5e-5,
              "disc_lr": 2e-4}                   # lr-only boundary
    cfg[4] = {"batch_size": 4, "batch_split": 1, "gen_lr": 5e-5,
              "disc_lr": 2e-4}                   # batch boundary -> rebuild
    cfg[int(1e3 + 1)] = {}

    out = str(tmp_path_factory.mktemp("curriculum"))
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    trainer = Trainer(0, 1, _opt(out), cfg, smpl_model=smpl)
    assert trainer._cur_lr == (1e-4, 4e-4)
    assert trainer.batch_size == 2

    trainer.run(max_steps=3)
    # crossed the lr boundary WITHOUT a stage rebuild
    assert trainer.step == 3
    assert trainer._cur_lr == (5e-5, 2e-4)
    assert trainer.batch_size == 2
    token_before = trainer._stage_token

    trainer.run(max_steps=6)
    # crossed the batch boundary: stage rebuilt, batch switched
    assert trainer.step == 6
    assert trainer.batch_size == 4
    assert trainer._stage_token > token_before
    # the content-hashed stage meta never carries lr keys (no in-place
    # mutation of the _META_CACHE-registered dict)
    assert "gen_lr" not in trainer._stage_meta

    # resume across the boundary lands in the correct stage
    trainer2 = Trainer(0, 1, _opt(out), cfg, smpl_model=smpl)
    assert trainer2.step == 6
    trainer2.run(max_steps=7)
    assert trainer2.step == 7
    assert trainer2.batch_size == 4
    assert trainer2._cur_lr == (5e-5, 2e-4)


def test_auto_remat_synthesis_flip_points():
    """Shape-aware remat default (round 5): the no-remat G backward holds
    ~2 residual maps per SPADE block; MAP3DBN512L batch 8 and MAP3DBN
    batch 32 exceed v5e HBM without remat (measured OOM, 20.6G/15.75G)
    while MAP3DBN batch 8/16 and MAP3DBN512 batch 8 measure faster
    without it."""
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.models.generator import auto_remat_synthesis

    m = lambda cfg: dict(configs.extract_metadata(cfg, 0))
    assert not auto_remat_synthesis(m(configs.MAP3DBN), 8)
    assert not auto_remat_synthesis(m(configs.MAP3DBN), 16)
    assert auto_remat_synthesis(m(configs.MAP3DBN), 32)
    assert not auto_remat_synthesis(m(configs.MAP3DBN512), 8)
    assert auto_remat_synthesis(m(configs.MAP3DBN512L), 8)
    # batch_split divides the live micro-batch back under the budget
    assert not auto_remat_synthesis(m(configs.MAP3DBN512L), 8 // 2)


@pytest.mark.heavy
def test_oom_recovery_doubles_batch_split(tmp_path_factory):
    """HBM-OOM recovery (round 5): an XLA out-of-memory on the train step
    doubles batch_split and rebuilds the stage (the single-chip batch-32
    full step exceeded 15.75G HBM by 0.5G even with remat on); unrelated
    errors and un-splittable micro-batches are re-raised."""
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers.base_trainer import Trainer

    out = str(tmp_path_factory.mktemp("oomrec"))
    cfg = dict(configs.MAP3DBN_TINY)
    cfg[0] = dict(cfg[0], batch_size=16)
    cfg["dataset_length"] = 16
    smpl = synthetic_smpl_model(num_verts=32, num_faces=40)
    trainer = Trainer(0, 1, _opt(out), cfg, smpl_model=smpl)

    # not an OOM: refused
    assert not trainer._try_oom_recovery(RuntimeError("some other failure"))
    assert int(trainer._stage_meta.get("batch_split", 1)) == 1

    oom = RuntimeError(
        "XLA:TPU compile permanent error. Ran out of memory in memory "
        "space hbm. Used 16.25G of 15.75G hbm.")
    per_dev = trainer.batch_size // int(
        __import__("numpy").prod(list(trainer.mesh.shape.values())))
    token = trainer._stage_token
    splits = []
    while trainer._try_oom_recovery(oom):
        splits.append(int(trainer._stage_meta["batch_split"]))
    # doubled until the per-device micro-batch hit 1, then refused
    assert splits and splits[0] == 2
    assert splits[-1] == per_dev
    assert trainer._stage_token > token
    # the floor survives a stage rebuild (curriculum boundary)
    trainer._build_stage(dict(configs.extract_metadata(cfg, 0)))
    assert int(trainer._stage_meta["batch_split"]) == per_dev
