"""Config engine parity tests (reference configs/__init__.py:5-76)."""

import math
import types

from threedhumangan_tpu import configs


def _opt(name, tune="", variant=0):
    return types.SimpleNamespace(config=name, tune=tune, variant=variant)


def test_extract_metadata_picks_largest_block_leq_step():
    meta0 = configs.extract_metadata(configs.MAP3DBN, 0)
    assert meta0["batch_size"] == 32
    assert meta0["gen_lr"] == 1e-4
    assert meta0["disc_lr"] == 4e-4

    meta_mid = configs.extract_metadata(configs.MAP3DBN, 140000)
    assert meta_mid["gen_lr"] == 1e-4

    meta_late = configs.extract_metadata(configs.MAP3DBN, 140001)
    assert meta_late["gen_lr"] == 5e-5
    assert meta_late["disc_lr"] == 2e-4

    # past the final (empty) block: no batch_size -> training loop stops
    meta_end = configs.extract_metadata(configs.MAP3DBN, 300001)
    assert "batch_size" not in meta_end
    assert meta_end["name"] == "map3dbn"  # string keys always merged


def test_phase_schedule_shape():
    meta = configs.extract_metadata(configs.MAP3DBN, 0)
    phases = meta["phases"]
    assert len(phases) == 8
    assert [p["do_r1"] for p in phases] == [False, False, False, True, False, False, False, True]
    assert [p["rotate"] for p in phases] == [False, True, True, False, False, True, False, True]


def test_upsample_steps_single_stage():
    # Reference semantics (configs/__init__.py:10-14): curriculum blocks
    # without explicit render sizes default to 512, so the 140001 lr-change
    # block registers as the "next upsample" even though resolution is fixed.
    assert configs.next_upsample_step(configs.MAP3DBN, 0) == 140001
    assert configs.next_upsample_step(configs.MAP3DBN, 300002) == math.inf
    assert configs.last_upsample_step(configs.MAP3DBN, 50) == 0


def test_get_config_does_not_mutate_registry():
    cfg1 = configs.get_config(_opt("MAP3DBN", tune="lr", variant=1))
    assert cfg1[0]["gen_lr"] == 2e-4
    assert configs.MAP3DBN[0]["gen_lr"] == 1e-4  # registry untouched
    assert "G_lr" in cfg1["name"]

    cfg2 = configs.get_config(_opt("MAP3DBN", tune="map3d_mode", variant=0))
    assert cfg2["map3d_mode"] == "isolated"
    assert configs.MAP3DBN["map3d_mode"] == "mixed"


def test_config_512_values():
    meta = configs.extract_metadata(configs.MAP3DBN512L, 0)
    assert meta["latent_dim"] == 420
    assert meta["render_width"] == 48
    assert meta["gen_height"] == 512
    assert meta["legacy_mode"] is True
    assert meta["map3d_mode"] == "isolated"
