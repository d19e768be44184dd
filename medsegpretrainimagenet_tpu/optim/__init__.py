"""Optimizers (optax) and learning-rate schedules."""
from .optimizers import OPTIMIZERS, Optimizer, build_optimizer  # noqa: F401
from .schedules import (DEFAULT_BASE_LR, ScheduleSpec,  # noqa: F401
                        build_schedule)

__all__ = ["Optimizer", "OPTIMIZERS", "build_optimizer", "build_schedule",
           "ScheduleSpec", "DEFAULT_BASE_LR"]
