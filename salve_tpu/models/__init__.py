"""Flax models: the early-fusion verifier CNN and its ResNet trunks.

TPU-native replacement for the reference's torchvision stack
(salve/models/early_fusion.py, salve/models/resnet_factory.py): NHWC
layouts, bfloat16 compute with float32 params, and pjit data-parallel
train/infer steps instead of torch.nn.DataParallel.
"""

from salve_tpu.models.early_fusion import EarlyFusionCEResnet  # noqa: F401
from salve_tpu.models.resnet import ResNet  # noqa: F401
