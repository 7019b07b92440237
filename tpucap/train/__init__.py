"""Training: masked-CE loss, jit/shard_map train step, evaluation."""

from tpucap.train.loss import masked_cross_entropy, caption_loss
from tpucap.train.loop import (
    TrainState,
    build_optimizer,
    freeze_subtree_updates,
    make_train_step,
    own_state,
    train_epoch,
)
from tpucap.train.distill import (
    distill_loss_from_sums,
    distill_loss_sums,
    make_distill_step,
)
from tpucap.train.preemption import PreemptionGuard
from tpucap.train.scheduled import epsilon_for_epoch, scheduled_inputs
from tpucap.train.scst import make_scst_rollout, make_scst_step, scst_loss
from tpucap.train.sequences import build_training_batch

__all__ = [
    "masked_cross_entropy",
    "caption_loss",
    "TrainState",
    "build_optimizer",
    "freeze_subtree_updates",
    "make_train_step",
    "own_state",
    "train_epoch",
    "build_training_batch",
    "PreemptionGuard",
    "make_scst_rollout",
    "make_scst_step",
    "scst_loss",
    "distill_loss_sums",
    "distill_loss_from_sums",
    "make_distill_step",
    "epsilon_for_epoch",
    "scheduled_inputs",
]
