"""threedhumangan_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of 3DHumanGAN.

A 3D-aware GAN synthesizing full-body human images consistent across view
angles and body poses (reference: 3dhumangan/3DHumanGAN, ICCV 2023).

Architecture (TPU-first, not a port):
  * functional core — params are pytrees (nested dicts), every module is an
    ``init_*(key, ...) -> params`` / ``apply_*(params, ...) -> out`` pair,
    pure under ``jax.jit``;
  * image tensors are NHWC (channels ride the 128-wide lane dimension);
  * point tensors are ``(batch, points, channels)`` with the point axis
    padded to MXU-friendly multiples;
  * compute in bfloat16 with float32 params and float32 accumulation;
  * SPMD via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``/``pmean``
    collectives over ICI (replacing the reference's NCCL DDP);
  * hot kernels (fused FiLM-SIREN ray march, KNN, mesh rasterization) have
    Pallas implementations with XLA reference paths.

Subpackages mirror the reference's layer map (SURVEY.md §1):
  configs/   — curriculum config registry (reference: configs/)
  ops/       — op library: bias_act, upfirdn2d, filtered_lrelu, knn,
               rasterize, raymarch (reference: lib/components/ops/)
  models/    — SIREN field, mapping nets, synthesis nets, generator,
               U-Net discriminator, volume rendering, SMPL geometry
               (reference: lib/generators, lib/implicit_funcitions,
                lib/discriminators, lib/components)
  data/      — dataset, preprocessor (SMPL rasterization), ADA augment
               (reference: lib/data/)
  trainers/  — adversarial training loop (reference: lib/trainers/)
  parallel/  — mesh construction, cross-replica stats, sharded steps
  utils/     — checkpointing, EMA, misc math
"""

__version__ = "0.1.0"
