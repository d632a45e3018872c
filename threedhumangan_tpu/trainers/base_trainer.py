"""Host-side training orchestration.

Behavioural parity with reference ``lib/trainers/base_trainer.py``
(BaseTrainer.run :328-449):
  * per-step ``extract_metadata`` curriculum lookup, loop stops when a
    block without batch_size is reached (ref :341-342, :368-369);
  * dataloader rebuild on batch/resolution change (ref :344-360) — here a
    resolution change also implies one re-jit (static shapes);
  * nerf_noise decay ``max(0, 1 - step/5000)`` (ref :384);
  * D step then G step (ref :386-397); ADA p controller hooks (ref :405-406,
    interval 0 in all shipped configs);
  * checkpoint every ``model_save_interval`` with keep-interval pruning
    (ref :377-378, :183-202); resume-from-latest (ref :74-91);
  * metrics: psum'd moment vectors -> host Collector; scalars appended to
    ``metrics.jsonl`` (stands in for TensorBoard, which is torch-side).

The reference's AMP GradScaler plumbing (ref :50-51, :374-375) has no TPU
equivalent because bf16 needs no loss scaling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import get_dataset_distributed
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models.generator import auto_remat_synthesis
from threedhumangan_tpu.parallel.mesh import create_mesh, shard_batch
from threedhumangan_tpu.parallel.stats import Collector
from threedhumangan_tpu.trainers.phase_trainer import (
    TrainState,
    init_train_state,
    make_mesh_train_pair,
)
from threedhumangan_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def z_sampler(key, shape, dist: str = "gaussian"):
    """(ref base_trainer.py:25-30)"""
    if dist == "gaussian":
        return jax.random.normal(key, shape)
    return jax.random.uniform(key, shape) * 2.0 - 1.0


class Trainer:
    """Single-host trainer (multi-chip via parallel.sharding wrappers)."""

    def __init__(self, rank: int, world_size: int, opt, config: Dict,
                 smpl_model=None):
        self.rank = rank
        self.world_size = world_size
        self.opt = opt
        self.config = config
        self.output_dir = os.path.join(opt.output_dir, config["name"])
        if rank == 0:
            os.makedirs(self.output_dir, exist_ok=True)

        self.meta = configs.extract_metadata(config, 0)
        self.smpl_model = smpl_model
        # TensorBoard event stream (ref base_trainer.py:67 SummaryWriter);
        # scalars mirror metrics.jsonl, weight histograms ride the
        # sample_interval cadence (ref log_weights :212-223).  Grad
        # histograms are represented by the per-group grad-norm scalars the
        # step already emits (grads are not retained host-side under jit).
        self.tb = None
        if rank == 0 and getattr(opt, "tensorboard", 1):
            from threedhumangan_tpu.utils.tb import EventWriter
            self.tb = EventWriter(self.output_dir)
        self.collector = Collector(".*")
        self._stats_acc = None  # device-side every-step moment accumulator
        self.ada_collector = Collector("real_signs.*")
        self.ada_p = 0.0  # ADA controller state (ref base_trainer.py:133-145)
        self.step = 0
        self._meta_cache_step: Optional[int] = None
        self._stage_meta: Optional[Dict] = None
        self._stage_token = 0  # bumped by _build_stage; run() watches it

        # SPMD: every process must pass IDENTICAL step keys to the global
        # jit (per-replica diversity comes from fold_in(axis_index) inside
        # the sharded step — the SPMD form of the reference's per-rank
        # seeding, ref apps/train.py:70-72); rank-dependent host seeds
        # would make multi-host programs diverge
        key = jax.random.PRNGKey(getattr(opt, "seed", 0))
        self.rng, init_key = jax.random.split(key)
        self.ts: TrainState = init_train_state(init_key, self.meta)

        ckpt = latest_checkpoint(self.output_dir)
        if ckpt:
            payload = load_checkpoint(ckpt)
            self.ts = jax.tree.map(jnp.asarray, TrainState(**payload["train_state"]))
            self.step = int(payload["step"])
            print(f"rank {rank}: resumed from {ckpt} at step {self.step}")

        self._build_stage(self.meta)

        # latent pool init from GAN-inversion latents (ref phase_trainer.py:29-32)
        if ckpt is None:
            latents = self.dataset.get_all_latents()
            self.ts = self.ts._replace(
                params_G={**self.ts.params_G, "latent_pool": jnp.asarray(latents)})
            # keep the whole state mesh-committed (one leaf left on the
            # default device would force a second compile of the step)
            from threedhumangan_tpu.parallel.mesh import replicate
            self.ts = replicate(self.ts, self.mesh)

    # -- stage management -----------------------------------------------------

    def _build_stage(self, meta: Dict):
        """(ref run :344-360): rebuild loader + preprocessor on stage change."""
        self._stage_token += 1
        self.proc_batch_size = meta["batch_size"] // self.world_size
        self.batch_size = meta["batch_size"]
        self.gen_height, self.gen_width = meta["gen_height"], meta["gen_width"]
        reserved = ("smpl_model", "batch_size", "name", "dataset", "world_size", "rank")
        kwargs = {k: v for k, v in meta.items() if k not in reserved}
        self.loader_fn, self.dataset = get_dataset_distributed(
            meta["dataset"], self.world_size, self.rank, self.proc_batch_size,
            smpl_model=self.smpl_model, **kwargs)
        self._stage_meta = dict(meta)
        self._stage_meta.pop("nerf_noise", None)
        # HBM-OOM recovery floor (see _try_oom_recovery): a previous stage
        # of this run hit compile-time OOM and raised the micro-batching
        self._stage_meta["batch_split"] = max(
            int(self._stage_meta.get("batch_split", 1)),
            getattr(self, "_batch_split_min", 1))
        # lrs are traced args of the train step, NOT part of the compiled
        # program: keep them out of the content-hashed stage meta entirely
        # (mutating the registered dict in place would silently change its
        # _META_CACHE/_MESH_PAIR_CACHE identity)
        self._cur_lr = (meta.get("gen_lr", 0.0), meta.get("disc_lr", 0.0))
        self._stage_meta.pop("gen_lr", None)
        self._stage_meta.pop("disc_lr", None)
        # geo features are stop-gradient data prep, so the Pallas 1-NN kernel
        # is usable in training whenever a real accelerator is present; the
        # fused ray-march likewise serves every no-grad forward (D-step fakes)
        # and, via the custom-VJP wrapper, the G-step grad path; the Pallas
        # tile rasterizer serves the per-batch conditioning
        on_accel = jax.default_backend() not in ("cpu",)
        self._stage_meta.setdefault("pallas_knn", on_accel)
        self._stage_meta.setdefault("pallas_geo", on_accel)
        self._stage_meta.setdefault("pallas_field", on_accel)
        self._stage_meta.setdefault("pallas_raster", on_accel)
        # trainable fused synthesis half-blocks (ops/synthesis_train.py)
        # serve the G-step grad path AND the D-step train-mode fakes
        self._stage_meta.setdefault("pallas_synthesis_train", on_accel)
        self.preprocessor = get_preprocessor(
            self._stage_meta, smpl_model=self.dataset.smpl_model)

        # SPMD mesh over all local devices whose count divides the per-proc
        # batch (TPU-native DDP, ref base_trainer.py:102-104): the batch axis
        # shards over 'data', grads/BN moments reduce over ICI
        n_proc = jax.process_count()
        if n_proc > 1:
            # multi-host SPMD (replaces the reference's multi-node NCCL,
            # ref apps/train.py:57): one global mesh over every process's
            # devices; each process feeds its rank's rows via
            # make_array_from_process_local_data (parallel/mesh.shard_batch)
            n_data = jax.device_count()
            if self.batch_size % n_data:
                raise ValueError(
                    f"multi-host runs need batch_size % device_count == 0 "
                    f"(batch {self.batch_size}, devices {n_data})")
        else:
            ndev = jax.local_device_count()
            n_data = max(n for n in range(1, ndev + 1)
                         if self.proc_batch_size % n == 0)
        self.mesh = create_mesh(n_data=n_data)
        # synthesis remat: only pay the recompute when the no-remat residual
        # set outgrows per-device HBM (a blanket False OOM'd the 512L and
        # batch-32 steps, round 5).  Decided per DEVICE micro-batch —
        # batch shards over the mesh and batch_split scans sequentially.
        if self._stage_meta["pallas_synthesis_train"]:
            per_dev = (self.batch_size // n_data if n_proc > 1
                       else max(1, self.proc_batch_size // n_data))
            micro = max(1, per_dev // int(self._stage_meta.get("batch_split", 1)))
            self._stage_meta.setdefault(
                "remat_synthesis",
                auto_remat_synthesis(self._stage_meta, micro))
        if self.ts is not None:
            # commit the train state to the mesh (replicated) BEFORE the
            # first step.  Besides being required on mesh changes (stale
            # device commitments) and multi-host (global addressability),
            # this keeps the FIRST call's input shardings identical to the
            # steady state (shard_map outputs carry mesh shardings), so jit
            # compiles ONE variant of the step program instead of a
            # throwaway host-input variant plus the real one — measured
            # ~90s of duplicate XLA compile per stage even for the NANO
            # config on the CPU CI host.
            from threedhumangan_tpu.parallel.mesh import replicate
            self.ts = replicate(self.ts, self.mesh)
        self.train_step = make_mesh_train_pair(
            self.mesh, self.preprocessor, self._stage_meta)
        # host->device placement for the prefetch worker: overlaps the H2D
        # transfer with the previous step and content-dedupes step-invariant
        # leaves (lbs_weights/tpose tables: 6 MB of the 13 MB batch)
        from threedhumangan_tpu.parallel.mesh import BatchUploader
        self._uploader = BatchUploader(self.mesh)

    def aot_compile_current_stage(self) -> None:
        """AOT-compile every phase-key variant of the current stage's train
        step without executing a single collective (see
        phase_trainer.make_mesh_train_pair.aot_compile).  Multi-process
        runs call this, then barrier on the coordination service, then
        ``run()`` — so no process sits in a Gloo rendezvous (hard ~30s
        timeout) while a peer is still compiling."""
        meta = self._meta_for_step(self.step)
        if meta is None:
            return
        data = next(iter(self.loader_fn(seed=0, shuffle=False)))
        batch = shard_batch(
            {k: jnp.asarray(v) for k, v in data.items()}, self.mesh)
        rng = jax.random.PRNGKey(0)
        for key in dict.fromkeys(
                (p["uncond"], p["gen_modal"]) for p in meta["phases"]):
            phase = next(p for p in meta["phases"]
                         if (p["uncond"], p["gen_modal"]) == key)
            self.train_step.aot_compile(
                self.ts, batch, rng, phase,
                lr_g=self._cur_lr[0], lr_d=self._cur_lr[1],
                nerf_noise=1.0, ada_p=self.ada_p)

    def _try_oom_recovery(self, e: BaseException) -> bool:
        """If ``e`` is an XLA HBM out-of-memory, double batch_split (lax.scan
        gradient accumulation, ref phase_trainer.py:363/456 batch_split) and
        rebuild the stage; returns True when the caller should retry the
        step.  Replaces a hard crash with the recovery the reference leaves
        to the operator (hand-editing batch_split in the config): the full
        D+G step's no-remat/remat footprints are estimated, not measured, so
        a real compile can still exceed HBM on shapes the estimator passes
        (e.g. single-chip batch 32 exceeded 15.75G by 0.5G even with remat).

        Compile-time OOM surfaces BEFORE execution, so donated train-state
        buffers are still intact and the retry is safe; a runtime OOM may
        have consumed them — detected below and restored from the latest
        checkpoint (same as a process restart)."""
        msg = str(e)
        if "Ran out of memory" not in msg and "RESOURCE_EXHAUSTED" not in msg:
            return False
        n_data = int(np.prod(list(self.mesh.shape.values())))
        per_dev = max(1, self.batch_size // n_data)
        cur = int(self._stage_meta.get("batch_split", 1))
        new = cur * 2
        if per_dev % new or per_dev < new:
            return False  # cannot micro-batch further — re-raise upstream
        self._batch_split_min = new
        print(f"rank {self.rank}: train step exceeded HBM; retrying with "
              f"batch_split={new} (was {cur})", flush=True)
        self._build_stage(configs.extract_metadata(self.config, self.step))
        # a RUNTIME OOM (vs compile-time) may have consumed the donated
        # train-state buffers mid-dispatch; restore from the latest
        # checkpoint if so (the npz resume path, same as a process restart)
        leaves = jax.tree_util.tree_leaves(self.ts)
        if any(getattr(l, "is_deleted", lambda: False)() for l in leaves):
            ckpt = latest_checkpoint(self.output_dir)
            if not ckpt:
                return False  # nothing to restore — re-raise upstream
            payload = load_checkpoint(ckpt)
            self.ts = jax.tree.map(
                jnp.asarray, TrainState(**payload["train_state"]))
            self.step = int(payload["step"])
            from threedhumangan_tpu.parallel.mesh import replicate
            self.ts = replicate(self.ts, self.mesh)
            print(f"rank {self.rank}: donated state was consumed by the "
                  f"failed step; restored {ckpt} at step {self.step}",
                  flush=True)
        return True

    def _meta_for_step(self, step: int) -> Optional[Dict]:
        meta = configs.extract_metadata(self.config, step)
        if "batch_size" not in meta:
            return None
        if (meta["batch_size"] != self.batch_size
                or meta["gen_height"] != self.gen_height
                or meta["gen_width"] != self.gen_width):
            self._build_stage(meta)
        # reuse the SAME dict object per stage so jit never re-traces; lr
        # changes at int-key boundaries (e.g. the 140k-step drop) flow
        # through self._cur_lr as traced data — no retrace, no mutation of
        # the content-hashed stage meta
        self._cur_lr = (meta["gen_lr"], meta["disc_lr"])
        return self._stage_meta

    # -- ADA controller (ref reset_augment/update_augment :133-145) ------------

    def update_augment(self, meta: Dict, stats) -> None:
        """Nudge ada_p by sign(E[sign(D(real))] - target) * delta."""
        self.ada_collector.update(jax.device_get(stats))
        if "real_signs" not in self.ada_collector.names():
            return
        delta = meta["ada_interval"] * meta["batch_size"] / (meta["ada_kimg"] * 1000)
        signs = self.ada_collector["real_signs"]
        self.ada_p = float(np.clip(
            self.ada_p + np.sign(signs - meta["ada_target"]) * delta, 0.0, 1.0))
        self.ada_collector.reset()

    # -- logging ----------------------------------------------------------------

    def write_options(self):
        """Dump opt/config/model summaries (ref write_options :148-157)."""
        from threedhumangan_tpu.utils.debug import count_params

        with open(os.path.join(self.output_dir, "options.txt"), "w") as f:
            f.write(str(vars(self.opt) if hasattr(self.opt, "__dict__") else self.opt))
            f.write("\n\n")
            f.write(f"generator: {count_params(self.ts.params_G):,} params\n")
            f.write(f"discriminator: {count_params(self.ts.params_D):,} params\n")
            f.write("\n\n")
            f.write(repr({k: v for k, v in self.config.items() if isinstance(k, str)}))

    def log_image(self, meta: Dict) -> None:
        """Save fixed/tilted EMA sample grids as PNGs (stands in for the
        reference's TensorBoard grids, ref log_image :226-310)."""
        from PIL import Image

        from threedhumangan_tpu.data.utils import make_grid
        from threedhumangan_tpu.models.generator import staged_forward

        n = min(4, self.proc_batch_size if self.proc_batch_size > 0 else 4)
        data = next(self.loader_fn(seed=123, shuffle=False))
        batch = {k: jnp.asarray(v[:n]) for k, v in data.items()}

        eval_meta = dict(self._stage_meta)
        eval_meta["nerf_noise"] = 0
        eval_meta["perturb_rays"] = False
        eval_meta["h_stddev"] = eval_meta["v_stddev"] = 0

        key = jax.random.PRNGKey(self.step)
        k_pre, k_z, k_gen = jax.random.split(key, 3)

        from threedhumangan_tpu.data.utils import colorize_labels
        from threedhumangan_tpu.models.discriminator import discriminator_forward

        for tag, h_mean in (("fixed", 0.0), ("tilted", float(meta.get("vis_rotate", 0.5)))):
            cond = self.preprocessor.forward_with_rotation(
                batch,
                jnp.full((n,), h_mean), jnp.zeros((n,)), jnp.zeros((n,)))
            z = jax.random.normal(k_z, (n, eval_meta["latent_dim"]))
            out, _ = staged_forward(
                self.ts.ema["params"], self.ts.state_G, z, cond, k_gen, eval_meta,
                truncation_psi=0.7)
            imgs = np.clip(np.asarray(out["rgbs"]) * 0.5 + 0.5, 0, 1)
            grid = make_grid(imgs, nrow=2)
            path = os.path.join(self.output_dir, f"{self.step:08d}_{tag}_ema.png")
            Image.fromarray((grid * 255).astype(np.uint8)).save(path)

            # D segmentation maps over the EMA samples (ref phase_trainer.py
            # log_image :553-683 logs the argmax of D's segment head)
            d_out, _ = discriminator_forward(
                self.ts.params_D, self.ts.state_D, out["rgbs"], train=False)
            seg = np.asarray(jnp.argmax(d_out["segments"], axis=-1))
            seg_rgb = colorize_labels(seg, eval_meta["label_dim"])
            if seg_rgb.shape[1:3] != imgs.shape[1:3]:
                seg_rgb = np.asarray(jax.image.resize(
                    jnp.asarray(seg_rgb),
                    (seg_rgb.shape[0],) + imgs.shape[1:3] + (3,), "nearest"))
            seg_grid = make_grid(seg_rgb.astype(np.float32), nrow=2)
            seg_path = os.path.join(self.output_dir, f"{self.step:08d}_{tag}_dseg.png")
            Image.fromarray((seg_grid * 255).astype(np.uint8)).save(seg_path)

    def _log(self, scalars: Dict[str, float]):
        if self.rank != 0:
            return
        path = os.path.join(self.output_dir, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"step": self.step, **scalars}) + "\n")
        if self.tb is not None:
            for name, value in scalars.items():
                self.tb.add_scalar(f"train/{name}", value, self.step)
            self.tb.flush()

    def log_weights(self):
        """Per-parameter weight histograms (ref log_weights :212-223)."""
        if self.tb is None:
            return
        for prefix, tree in (("train/weights/gen", self.ts.params_G),
                             ("train/weights/disc", self.ts.params_D)):
            flat, _ = jax.tree_util.tree_flatten_with_path(tree)
            for kp, leaf in flat:
                tag = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                               for k in kp)
                self.tb.add_histogram(f"{prefix}/{tag}", np.asarray(leaf),
                                      self.step)
        self.tb.flush()

    # -- main loop ----------------------------------------------------------------

    def run(self, max_steps: Optional[int] = None) -> None:
        try:
            self._run(max_steps)
        finally:
            self._join_save()  # the last async checkpoint write must land

    def _run(self, max_steps: Optional[int] = None) -> None:
        n_epochs = getattr(self.opt, "n_epochs", 1)
        save_interval = getattr(self.opt, "model_save_interval", 1000)
        keep_interval = getattr(self.opt, "model_keep_interval", 5000)
        sample_interval = getattr(self.opt, "sample_interval", 0)
        if self.rank == 0:
            self.write_options()
        t0 = time.time()
        t_window = t0          # windowed-throughput anchor (last log flush)
        step_window = self.step
        host_sec = 0.0         # ckpt/vis wall time inside the current window

        for epoch in range(n_epochs):
            meta = self._meta_for_step(self.step)
            if meta is None:
                break
            from threedhumangan_tpu.data.prefetch import prefetch

            stage_token = self._stage_token
            for batch in prefetch(self.loader_fn(seed=epoch, shuffle=True),
                                  transform=self._uploader):
                meta = self._meta_for_step(self.step)
                if meta is None:
                    if self.rank == 0:
                        self.save()
                    return
                if self._stage_token != stage_token:
                    # batch/resolution curriculum boundary: the in-flight
                    # loader yields stale-shaped batches — restart the data
                    # loop on the rebuilt loader (ref run :344-360)
                    self._stats_acc = None  # old-stage moments: drop
                    break
                if max_steps is not None and self.step >= max_steps:
                    if self.rank == 0:
                        self.save()
                    return

                phase = meta["phases"][self.step % len(meta["phases"])]
                nerf_noise = max(0.0, 1.0 - self.step / 5000.0)  # ref :384

                self.rng, step_key = jax.random.split(self.rng)
                while True:
                    try:
                        self.ts, stats = self.train_step(
                            self.ts, batch, step_key, phase,
                            lr_g=self._cur_lr[0], lr_d=self._cur_lr[1],
                            nerf_noise=nerf_noise, ada_p=self.ada_p)
                        break
                    except Exception as e:  # HBM OOM -> double batch_split
                        if not self._try_oom_recovery(e):
                            raise
                        # the rebuild bumped the stage token; this retry is
                        # same-shape (only micro-batching changed), so keep
                        # the loader and the already-uploaded batch
                        stage_token = self._stage_token
                self.step += 1

                # ADA p update (ref run :405-406; interval 0 disables)
                if meta.get("ada_interval", 0) and self.step % meta["ada_interval"] == 0:
                    self.update_augment(meta, stats)

                if self.rank == 0:
                    # accumulate EVERY step's moments device-side (async tiny
                    # adds, no host sync) so phase-gated stats are not lost:
                    # with host sampling at step % 10 only even phase slots
                    # are ever observed and `r1` (slots 3/7) logs 0 forever
                    # key-union merge: per-phase steps may return different
                    # stat sets (e.g. perceptual/photometric only on
                    # conditional phases), so a strict tree_map(jnp.add)
                    # would crash on a mixed cond/uncond schedule
                    if self._stats_acc is None:
                        self._stats_acc = dict(stats)
                    else:
                        for k, v in stats.items():
                            self._stats_acc[k] = (
                                v if k not in self._stats_acc
                                else jnp.add(self._stats_acc[k], v))
                if self.rank == 0 and (self.step % 10 == 0 or self.step == 1):
                    self.collector.update(jax.device_get(self._stats_acc))
                    self._stats_acc = None
                    # zero-count moments (e.g. r1 in a window with no R1
                    # phase step) mean "no observations" — skip the scalar
                    # rather than log NaN (ref reports r1 only on do_r1
                    # steps, phase_trainer.py:392-393)
                    scalars = {n: self.collector[n] for n in self.collector.names()
                               if self.collector.num(n) > 0}
                    now = time.time()
                    # steady-state throughput: this log window only (the
                    # cumulative average is dominated by the first compile
                    # for short runs — round-4 soak reported 3.3 imgs/s for
                    # a loop actually sustaining ~21)
                    scalars["imgs_per_sec"] = (
                        (self.step - step_window) * self.batch_size
                        / max(now - t_window, 1e-9))
                    scalars["imgs_per_sec_cum"] = (
                        self.step * self.batch_size / max(now - t0, 1e-9))
                    if host_sec:
                        scalars["host_io_sec"] = host_sec  # ckpt/vis in window
                    t_window, step_window, host_sec = now, self.step, 0.0
                    self._log(scalars)
                    self.collector.reset()

                if self.rank == 0 and self.step % save_interval == 0 and self.step > 0:
                    t_io = time.time()
                    self.save()
                    host_sec += time.time() - t_io

                if (self.rank == 0 and sample_interval
                        and self.step % sample_interval == 0 and self.step > 0):
                    t_io = time.time()
                    self.log_image(meta)  # ref run :439-443
                    self.log_weights()  # ref run :443
                    host_sec += time.time() - t_io

        if self.rank == 0:
            self.save()

    def save(self):
        """Checkpoint: the device->host pull is synchronous (the next step
        donates the TrainState buffers), the npz write+prune runs on a
        background thread so multi-second file IO doesn't stall the step
        stream.  Writes are serialized (join the previous one first)."""
        import threading

        self._join_save()
        payload = {"train_state": jax.device_get(self.ts)._asdict(),
                   "config_name": self.config["name"]}
        step, out_dir = self.step, self.output_dir
        keep = getattr(self.opt, "model_keep_interval", 5000)
        self._save_thread = threading.Thread(
            target=save_checkpoint, args=(out_dir, step, payload),
            kwargs={"keep_interval": keep}, daemon=True)
        self._save_thread.start()

    def _join_save(self):
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None


# registry for apps/train.py-style dispatch (ref apps/train.py:75)
TRAINERS = {"PhaseTrainer": Trainer, "BaseTrainer": Trainer}
