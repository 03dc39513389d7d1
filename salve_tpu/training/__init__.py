"""Stage C: verifier training/inference on TPU.

Replaces the reference's torch stack (salve/train_utils.py, scripts/train.py,
scripts/test.py): optax + poly LR instead of hand-stepped torch.optim, pjit
data parallelism over the device mesh instead of torch.nn.DataParallel, and
batched on-device augmentation instead of per-worker torchvision pipelines.
"""
