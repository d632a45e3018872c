"""True multi-host (2-process) execution vs single-process DDP equivalence.

The reference trains multi-node NCCL (reference apps/train.py:57).  The TPU
build's equivalent is one jax.distributed SPMD program over a global mesh;
this test runs it for real: 2 localhost processes x 4 virtual CPU devices,
production Trainer, batches crossing the process boundary via
``make_array_from_process_local_data`` (parallel/mesh.shard_batch).

Asserts:
  * both processes complete 2 steps and hold IDENTICAL final parameters
    (replica consistency across hosts);
  * replaying the exact global batches (process-0 rows ++ process-1 rows)
    through a single-process 8-device Trainer yields the same parameters —
    multi-host changes the communication path, not the math.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("multihost"))
    coordinator = f"localhost:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split

    procs = [
        subprocess.Popen(
            [sys.executable, worker, out_dir, coordinator, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    with open(os.path.join(out_dir, "result_p0.pkl"), "rb") as f:
        r0 = pickle.load(f)
    with open(os.path.join(out_dir, "result_p1.pkl"), "rb") as f:
        r1 = pickle.load(f)

    # replica consistency across hosts: replicated params agree exactly
    for k in ("params_G", "params_D"):
        flat0, flat1 = _flat(r0[k]), _flat(r1[k])
        assert flat0.keys() == flat1.keys()
        for name in flat0:
            np.testing.assert_array_equal(
                flat0[name], flat1[name], err_msg=f"{k}:{name} differs across hosts")

    # single-process replay of the same global batches (p0 rows are mesh
    # positions 0-3, p1 rows 4-7 -> global batch = concat(p0, p1)).  The
    # loader may have fetched one batch beyond the max_steps cutoff; only
    # the first two were consumed by training steps.
    assert len(r0["captured"]) >= 2 and len(r1["captured"]) >= 2
    global_batches = [
        {key: np.concatenate([b0[key], b1[key]], axis=0) for key in b0}
        for b0, b1 in zip(r0["captured"][:2], r1["captured"][:2])
    ]

    from types import SimpleNamespace

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers.base_trainer import Trainer

    cfg = dict(configs.MAP3DBN_NANO)
    cfg["name"] = "multihost_ref"
    cfg["dataset_length"] = 16
    cfg[0] = {"batch_size": 8, "batch_split": 1, "gen_lr": 1e-4, "disc_lr": 4e-4}
    cfg[1001] = {}
    opt = SimpleNamespace(
        output_dir=out_dir + "/ref", n_epochs=10, sample_interval=0,
        model_save_interval=1000, model_keep_interval=5000, seed=0)
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    trainer = Trainer(0, 1, opt, cfg, smpl_model=smpl)

    batches = iter(global_batches)

    def replay_loader(seed=0, shuffle=True):
        try:
            yield next(batches)
        except StopIteration:
            return

    trainer.loader_fn = replay_loader
    trainer.run(max_steps=2)
    assert trainer.step == 2

    import jax

    ts = jax.device_get(trainer.ts)
    for k, ref in (("params_G", ts.params_G), ("params_D", ts.params_D)):
        flat_mh, flat_sp = _flat(r0[k]), _flat(jax.tree.map(np.asarray, ref))
        assert flat_mh.keys() == flat_sp.keys()
        for name in flat_mh:
            np.testing.assert_allclose(
                flat_mh[name], flat_sp[name], rtol=2e-4, atol=2e-6,
                err_msg=f"{k}:{name} multi-host vs single-process")


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flat(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out
