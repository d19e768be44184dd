"""Dataset readers (COVID-QU, ImageNet, IDRiD, ACDC)."""
from .covidqu import COVIDQUDataset  # noqa: F401
from .imagenet import ImageNet  # noqa: F401

__all__ = ["COVIDQUDataset", "ImageNet"]
