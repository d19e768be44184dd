"""Data layer: readers, balanced sampling, transforms, loading."""
from .dataset import Dataset  # noqa: F401
from .loader import BalancedDataLoader, prefetch_to_device  # noqa: F401
from .sampling import BalancedSource, assemble_batch  # noqa: F401
from . import transforms  # noqa: F401
from . import readers  # noqa: F401
from .mixed import MixedDataset  # noqa: F401

__all__ = ["Dataset", "BalancedDataLoader", "BalancedSource",
           "assemble_batch", "prefetch_to_device", "MixedDataset"]
