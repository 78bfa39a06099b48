from adafocus_tpu.train.optim import (
    OptimConfig,
    lr_schedule,
    make_stage_optimizer,
    stage_trainable,
)
from adafocus_tpu.train.stages import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_stage_train_step,
    make_stage2_step,
)

__all__ = [
    "OptimConfig",
    "lr_schedule",
    "make_stage_optimizer",
    "stage_trainable",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_stage_train_step",
    "make_stage2_step",
]
