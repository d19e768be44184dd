"""L1 config kernel: ConfigDict, grid expansion, registry, defaults."""
from .config_dict import ConfigDict
from .grid import expand_grid, parse
from . import registry
from .registry import register, resolve, build, fill_spec, get_kwargs
from .defaults import default_experiment_config, default_model_eval

__all__ = [
    "ConfigDict", "expand_grid", "parse", "registry", "register", "resolve",
    "build", "fill_spec", "get_kwargs", "default_experiment_config",
    "default_model_eval",
]
