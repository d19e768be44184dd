"""TPU compute kernels (Pallas) with pure-XLA fallbacks."""
from .window_attention import (fused_image_window_attention,
                               set_fused_image_mode, use_fused_image,
                               window_attention_core)

__all__ = ["window_attention_core", "fused_image_window_attention",
           "set_fused_image_mode", "use_fused_image"]
