"""ResNet v1 trunks in Flax (NHWC, bf16-friendly).

Equivalent capability to the reference's torchvision trunks
(salve/models/resnet_factory.py:26: ResNet-18/34/50/152 with ImageNet
weights). Re-designed for TPU: NHWC layout feeds the MXU's native
convolution tiling, compute dtype is configurable (bfloat16 by default
under training) with float32 parameters and batch-norm statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

# (block type, stage sizes, feature dim) per depth.
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2), 512),
    34: ("basic", (3, 4, 6, 3), 512),
    50: ("bottleneck", (3, 4, 6, 3), 2048),
    152: ("bottleneck", (3, 8, 36, 3), 2048),
}


def get_resnet_feature_dim(num_layers: int) -> int:
    """Trunk output width (parity: salve/models/resnet_factory.py:7)."""
    return RESNET_SPECS[num_layers][2]


class BasicBlock(nn.Module):
    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        # Explicit (1,1) padding: XLA "SAME" pads (0,1) under stride 2, a
        # one-pixel shift vs torch's symmetric pad=1 — symmetric padding
        # keeps converted torch checkpoints (models/torch_weights.py) exact.
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        # Symmetric padding for torch-checkpoint parity (see BasicBlock).
        y = self.conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet v1 trunk. Returns pooled (B, feature_dim) features.

    Attributes:
        num_layers: 18, 34, 50, or 152.
        compute_dtype: activation dtype (bfloat16 on TPU; params stay f32).
    """

    num_layers: int = 50
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stage_sizes, _ = RESNET_SPECS[self.num_layers]
        conv = partial(nn.Conv, use_bias=False, dtype=self.compute_dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
        )
        block_cls = BasicBlock if block_kind == "basic" else BottleneckBlock

        x = x.astype(self.compute_dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, block_count in enumerate(stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = block_cls(
                    filters=64 * 2**i, conv=conv, norm=norm, strides=strides
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)
