from .experiment import main, run_experiment_from_dict  # noqa: F401
from .run_experiment import experiment, run_exp  # noqa: F401

__all__ = ["main", "run_experiment_from_dict", "experiment", "run_exp"]
