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
    "make_train_step", "AudioTrainer", "AudioLightningModule",
]


def __getattr__(name):
    # lazy: AudioTrainer pulls in the model zoo; AudioLightningModule is
    # the reference-name alias (look2hear.system.__all__:15) so
    # getattr(system, config["training"]["system"]) keeps working
    if name in ("AudioTrainer", "AudioLightningModule"):
        from tdanet_tpu.system.training_loop import AudioTrainer
        return AudioTrainer
    raise AttributeError(name)
