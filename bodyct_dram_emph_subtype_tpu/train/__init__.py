"""Training system (the reference's L5, rebuilt as an explicit jitted loop)."""
from .checkpoint import CheckpointManager, greedy_restore_variables
from .loop import SubtypeTrainer, TrainerConfig
from .state import TrainState, apply_updates, epoch_lr, make_optimizer
from .steps import (
    make_cls_train_step,
    make_eval_step,
    make_predict_step,
    make_reg_train_step,
)

__all__ = [
    "CheckpointManager", "SubtypeTrainer", "TrainState", "TrainerConfig",
    "apply_updates", "epoch_lr", "greedy_restore_variables",
    "make_cls_train_step", "make_eval_step", "make_predict_step",
    "make_reg_train_step", "make_optimizer",
]
