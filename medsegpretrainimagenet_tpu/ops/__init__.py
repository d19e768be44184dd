"""TPU compute kernels (Pallas) with pure-XLA fallbacks."""
from .window_attention import window_attention_core

__all__ = ["window_attention_core"]
