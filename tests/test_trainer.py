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


def test_trainer_runs_and_checkpoints(tmp_path_factory, tiny_config):
    out = str(tmp_path_factory.mktemp("train"))
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    trainer = Trainer(0, 1, _opt(out), tiny_config, smpl_model=smpl)
    # the trainer shards its batch over the mesh (batch 2 -> 2 CPU devices)
    assert trainer.mesh.shape["data"] == 2
    trainer.run(max_steps=2)
    assert trainer.step == 2
    ckpt_dir = os.path.join(out, "trainer_test")
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith("checkpoint.pkl")]
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
