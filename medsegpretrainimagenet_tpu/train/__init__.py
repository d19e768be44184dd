"""Training: jitted steps, epoch loop, state, checkpoints."""
from . import checkpoint  # noqa: F401
from .loop import append_csv_row, run_epoch, train_model  # noqa: F401
from .state import TrainState  # noqa: F401
from .step import global_norm, make_eval_step, make_train_step  # noqa: F401

__all__ = ["TrainState", "train_model", "run_epoch", "make_train_step",
           "make_eval_step", "global_norm", "checkpoint", "append_csv_row"]
