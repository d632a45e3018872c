"""Worker process for the 2-process multi-host test (test_multihost.py).

Each worker is one "host" of a jax.distributed CPU cluster (4 virtual
devices per process, 8 global).  It trains MAP3DBN_NANO for 2 steps through
the production Trainer — the same path a multi-node TPU pod run takes
(global mesh over all processes' devices, batches fed per-process via
``make_array_from_process_local_data``) — then dumps its final parameters
and the local batch rows it fed, so the parent test can replay the exact
global batches through a single-process 8-device run and assert parameter
equality (the DDP-equivalence property, ref multi-node NCCL at
reference apps/train.py:57).

Usage: _multihost_worker.py <out_dir> <coordinator> <num_procs> <proc_id>
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

out_dir, coordinator, num_procs, proc_id = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# dedicated cache dir: entries written by the single-process suite are
# compiled with different XLA:CPU flags and fail to load here (machine
# feature mismatch), adding minutes of noisy misses
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_mh"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id)

# establish the Gloo collectives context NOW, while inter-worker skew is
# seconds: its rendezvous has a hard 30s GetKeyValue timeout, and the first
# train-step compile (~minutes, unsynchronized across workers) would blow
# through it if the context were first created there
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("multihost_worker_warmup")

import numpy as np  # noqa: E402
from types import SimpleNamespace  # noqa: E402

from threedhumangan_tpu import configs  # noqa: E402
from threedhumangan_tpu.models.smpl import synthetic_smpl_model  # noqa: E402
from threedhumangan_tpu.trainers.base_trainer import Trainer  # noqa: E402


def main():
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs

    cfg = dict(configs.MAP3DBN_NANO)
    cfg["name"] = "multihost"
    cfg["dataset_length"] = 16
    cfg[0] = {"batch_size": 8, "batch_split": 1, "gen_lr": 1e-4, "disc_lr": 4e-4}
    cfg[1001] = {}

    opt = SimpleNamespace(
        output_dir=os.path.join(out_dir, "run"), n_epochs=10, sample_interval=0,
        model_save_interval=1000, model_keep_interval=5000, seed=0)
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    trainer = Trainer(jax.process_index(), jax.process_count(), opt, cfg,
                      smpl_model=smpl)

    captured = []
    orig_loader = trainer.loader_fn

    def recording_loader(seed=0, shuffle=True):
        for b in orig_loader(seed=seed, shuffle=shuffle):
            captured.append({k: np.asarray(v) for k, v in b.items()})
            yield b

    # compile first (local, no collectives), THEN rendezvous on the
    # coordination service (10-min timeout), THEN execute: the Gloo
    # context rendezvous inside the first executed step has a hard ~30s
    # timeout that an unsynchronized multi-minute compile would blow
    trainer.aot_compile_current_stage()
    from jax._src import distributed  # noqa: E402
    distributed.global_state.client.wait_at_barrier(
        "mh_compiled", timeout_in_ms=600_000)

    trainer.loader_fn = recording_loader
    trainer.run(max_steps=2)
    assert trainer.step == 2

    ts = jax.device_get(trainer.ts)
    result = {
        "captured": captured,
        "params_G": jax.tree.map(np.asarray, ts.params_G),
        "params_D": jax.tree.map(np.asarray, ts.params_D),
    }
    with open(os.path.join(out_dir, f"result_p{proc_id}.pkl"), "wb") as f:
        pickle.dump(result, f)
    print(f"worker {proc_id}: ok")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
