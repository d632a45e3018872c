"""Trainers: orchestration of the adversarial loop (reference layer L5)."""

from threedhumangan_tpu.trainers.base_trainer import TRAINERS, Trainer, z_sampler
from threedhumangan_tpu.trainers.losses import (
    gan_loss_d,
    gan_loss_g,
    r1_regularization,
    segmentation_loss,
    smooth_l1,
)
from threedhumangan_tpu.trainers.phase_trainer import (
    TrainState,
    d_train_step,
    g_train_step,
    init_train_state,
    train_step_pair,
)
