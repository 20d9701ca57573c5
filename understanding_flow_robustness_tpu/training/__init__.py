"""Training: losses, optimizer, jitted data-parallel train step."""

from .losses import MAX_FLOW, multiscale_epe, sequence_loss
from .optim import fetch_optimizer, onecycle_linear
from .train_step import TrainState, make_train_step, shard_train_step

__all__ = [
    "MAX_FLOW",
    "TrainState",
    "fetch_optimizer",
    "make_train_step",
    "multiscale_epe",
    "onecycle_linear",
    "sequence_loss",
    "shard_train_step",
]

from . import checkpoint, evaluate, trainer  # noqa: E402
from .trainer import TrainConfig, train  # noqa: E402

__all__ += ["TrainConfig", "checkpoint", "evaluate", "train", "trainer"]
