"""Distributed training CLI.

CLI parity with reference ``apps/train.py`` (argparse surface :22-48).  The
launch model differs by design: the reference spawns one NCCL process per
GPU (``torch.distributed.launch``); on TPU one process drives every local
chip through an ICI mesh (SPMD), and multi-host runs initialize
``jax.distributed`` from the standard TPU environment variables.

Usage:
  python apps/train.py --config MAP3DBN --output_dir log
"""

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--n_epochs", type=int, default=3000)
    parser.add_argument("--sample_interval", type=int, default=1000)
    parser.add_argument("--output_dir", type=str, default="log")
    parser.add_argument("--eval_freq", type=int, default=0)
    parser.add_argument("--set_step", type=int, default=None)
    parser.add_argument("--model_save_interval", type=int, default=1000)
    parser.add_argument("--model_keep_interval", type=int, default=5000)
    parser.add_argument("--bs_factor", type=int, default=1, help="batch split factor")
    parser.add_argument("--local_rank", default=-1, type=int)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu for smoke tests)")
    # parameter tuning options
    parser.add_argument("--tensorboard", type=int, default=1,
                        help="write tfevents alongside metrics.jsonl")
    parser.add_argument("--tune", type=str, default="")
    parser.add_argument("--variant", type=int, default=0)
    opt = parser.parse_args()
    assert opt.model_keep_interval % opt.model_save_interval == 0
    return opt


def main():
    opt = parse_args()

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    # multi-host: initialize the JAX distributed runtime when launched under
    # a multi-process environment (replaces dist.init_process_group,
    # ref apps/train.py:57).  On TPU pods the coordinator auto-detects from
    # the TPU metadata; elsewhere (tests, CPU clusters) COORDINATOR_ADDRESS/
    # NUM_PROCESSES/PROCESS_ID pin it explicitly.
    n_proc = int(os.environ.get("TPU_WORKER_COUNT",
                                os.environ.get("NUM_PROCESSES", "1")))
    if n_proc > 1:
        coord = os.environ.get("COORDINATOR_ADDRESS")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord, num_processes=n_proc,
                process_id=int(os.environ["PROCESS_ID"]))
        else:
            jax.distributed.initialize()

    rank = jax.process_index()
    world_size = jax.process_count()

    from threedhumangan_tpu import configs
    from threedhumangan_tpu.trainers import TRAINERS

    if rank == 0:
        print(opt)
        os.makedirs(opt.output_dir, exist_ok=True)

    config = configs.get_config(opt)
    trainer_cls = TRAINERS[config["trainer"]]
    trainer = trainer_cls(rank, world_size, opt, config)
    if opt.set_step is not None:
        trainer.step = opt.set_step  # ref base_trainer.py:59-61
    trainer.run(max_steps=opt.max_steps)
    print(f"training finished at step {trainer.step}")


if __name__ == "__main__":
    main()
    # the axon TPU plugin (pre-registered in this environment) aborts in its
    # C++ teardown when the active platform was switched after import; all
    # work is flushed by now, so skip interpreter finalization
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
