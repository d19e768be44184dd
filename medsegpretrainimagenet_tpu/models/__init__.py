"""Model zoo: configurable U-Nets, DeepResNet, Swin blocks, wrappers."""
from . import activations  # noqa: F401  (registers activation components)
from . import blocks  # noqa: F401
from . import init  # noqa: F401
from .feedforward import CompoundModel, FeedForwardModel  # noqa: F401
from .resnet import DeepResNet  # noqa: F401
from .swin import (DoubleSwinTransformerBlock, FinalPatchExpand_X4,  # noqa: F401
                   PatchEmbed, PatchExpand, PatchMerging,
                   SwinTransformerBlock, WindowAttention)
from .unet import UNet, UNetDecoder, UNetEncoder  # noqa: F401
from .wrapper import Model  # noqa: F401

__all__ = ["Model", "UNet", "UNetEncoder", "UNetDecoder", "DeepResNet",
           "CompoundModel", "FeedForwardModel", "PatchEmbed", "PatchMerging",
           "PatchExpand", "FinalPatchExpand_X4", "SwinTransformerBlock",
           "DoubleSwinTransformerBlock", "WindowAttention"]
