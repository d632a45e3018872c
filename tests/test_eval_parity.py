"""Synthetic-mode test of apps/eval_parity.py (VERDICT round-2 item #4):
the command must run to completion with zero assets, write goldens, and
report ~zero deltas against its own goldens."""

import json
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _run(argv, monkeypatch):
    import apps.eval_parity as ep

    # keep a handle to the real parser: repeated _run calls in one test
    # would otherwise re-enter the lambda installed below
    orig = getattr(ep, "_orig_parse_args", None) or ep.parse_args
    ep._orig_parse_args = orig
    monkeypatch.setattr(sys, "argv", ["eval_parity.py"] + argv)
    opt = orig()
    # call main's body without the os._exit wrapper
    monkeypatch.setattr(ep, "parse_args", lambda: opt)
    return ep.main()


@pytest.mark.slow
def test_eval_parity_synthetic_round_trip(tmp_path, monkeypatch, capsys):
    golden_dir = str(tmp_path / "goldens")
    out_dir = str(tmp_path / "out")

    # pass 1: no checkpoint, write goldens
    rc = _run(["--config", "MAP3DBN_NANO", "--seeds", "1", "2", "3", "4",
               "--dataset_length", "4", "--output_dir", out_dir,
               "--write_goldens", golden_dir], monkeypatch)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    assert "random-init" in summary["weights"]
    assert summary["goldens_written"] == golden_dir
    g = np.load(tmp_path / "goldens" / "seed_001.npy")
    assert g.ndim == 3 and g.shape[-1] == 3
    assert np.isfinite(g).all()

    # pass 2: compare against the just-written goldens -> ~zero deltas
    rc = _run(["--config", "MAP3DBN_NANO", "--seeds", "1", "2", "3", "4",
               "--dataset_length", "4", "--output_dir", out_dir,
               "--goldens", golden_dir], monkeypatch)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    per_pixel = summary["per_pixel"]
    assert set(per_pixel) == {"1", "2", "3", "4"} or set(per_pixel) == {1, 2, 3, 4}
    for d in per_pixel.values():
        assert d["max_abs"] < 1e-5, d
    assert summary["feature_frechet"] < 1e-3
    # the label is loud about the fallback feature space
    assert "NOT Inception-FID" in summary["feature_space"]

    # parity.json persisted
    with open(tmp_path / "out" / "parity.json") as f:
        assert json.load(f)["n_seeds"] == 4


def test_eval_parity_accepts_converted_checkpoint(tmp_path, monkeypatch, capsys):
    """A synthetic torch state_dict in the reference key space flows through
    the --torch_checkpoint branch (utils.torch_convert)."""
    import pickle

    from threedhumangan_tpu import configs
    from tests.test_torch_convert import _reference_keyspace_state_dict

    meta = dict(configs.extract_metadata(configs.MAP3DBN_NANO, 0))
    sd = _reference_keyspace_state_dict(meta)
    ckpt = tmp_path / "ema.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(sd, f)

    rc = _run(["--config", "MAP3DBN_NANO", "--seeds", "1", "2",
               "--dataset_length", "4", "--output_dir", str(tmp_path / "o"),
               "--torch_checkpoint", str(ckpt)], monkeypatch)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["weights"] == "released-checkpoint"
