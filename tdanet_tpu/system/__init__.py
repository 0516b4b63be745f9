"""Training runtime: optimizers, schedulers, jitted steps, checkpointing."""

from tdanet_tpu.system.optimizers import (
    get_learning_rate,
    make_optimizer,
    register_optimizer,
    set_learning_rate,
)
from tdanet_tpu.system.schedulers import (
    BaseScheduler,
    DPTNetScheduler,
    ReduceLROnPlateau,
    make_scheduler,
)
from tdanet_tpu.system.trainer import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward,
    make_train_step,
)

__all__ = [
    "get_learning_rate", "make_optimizer", "register_optimizer",
    "set_learning_rate", "BaseScheduler", "DPTNetScheduler",
    "ReduceLROnPlateau", "make_scheduler", "TrainState",
    "create_train_state", "make_eval_step", "make_forward",
    "make_train_step",
]
