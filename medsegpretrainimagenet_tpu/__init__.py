"""medsegpretrainimagenet_tpu — TPU-native medical-segmentation pretraining framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``aielte-research/MedSegPretrainImageNet`` (mounted read-only at
``/root/reference``): YAML-driven experiment grids over configurable U-Nets,
ResNet-50 and Swin-U-Net models, medical segmentation datasets (COVID-QU,
IDRiD, ACDC) and ImageNet encoder pretraining, with a jittable metric suite
(Dice, Jaccard, MCC, HD95, AUROC, ...), optax optimizers/schedules, Orbax
checkpointing and encoder-transfer loading, and transferability
("robustness") scoring of pretrained encoders.

Compute path: flax.linen models compiled under ``jit`` over a
``jax.sharding.Mesh`` (data-parallel by default), Pallas kernels for the hot
non-matmul ops (fused window attention, distance transforms).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401  (light; pulls no JAX)
