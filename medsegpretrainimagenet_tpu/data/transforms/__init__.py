"""Transforms: generic machinery + segmentation/classification augs."""
from .core import (Compose, ConvertToType, CutMix, LambdaTransform,  # noqa
                   Mixup, RepeatChannels, TransformWrapper, build_transform)
from . import classification  # noqa: F401
from . import segmentation  # noqa: F401

__all__ = ["Compose", "ConvertToType", "CutMix", "LambdaTransform", "Mixup",
           "RepeatChannels", "TransformWrapper", "build_transform"]
