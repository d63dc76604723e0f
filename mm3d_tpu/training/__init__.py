"""L3 training: state, schedules, jitted steps, epoch loops, CLI glue."""

from mm3d_tpu.training.state import TrainState, create_train_state, make_optimizer
from mm3d_tpu.training.schedules import step_lr, bn_momentum_schedule
from mm3d_tpu.training import steps

__all__ = ["TrainState", "create_train_state", "make_optimizer", "step_lr",
           "bn_momentum_schedule", "steps"]
