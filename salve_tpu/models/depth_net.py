"""Monocular pano depth network (the HoHoNet role) in Flax.

The reference pipeline depends on HoHoNet (sunset1995/HoHoNet) run through
vendored glue (salve/utils/infer_depth.py:28) purely as a depth producer:
equirect RGB (512,1024) in, u16 millimeter depth out, cached on disk. The
HoHoNet weights/code are an external repo in the reference; here the same
role is filled by a TPU-native architecture following HoHoNet's design
recipe — 2D encoder, per-column height compression to a 1D sequence,
a width-axis transformer with circular (pano-wrap) attention, and a
column-to-dense decoder:

    ResNet-50 trunk (NHWC, bf16)           -> (H/32, W/32, 2048)
    height compression (column max+mean)   -> (W/32, C)
    4x transformer blocks over width       -> (W/32, C)  [global pano context]
    per-column upsampling decoder          -> (512, 1024) depth (meters)

Trains against ZInD layout-raycast depth (synthesize_depth_from_layout) —
ZInD's GT room geometry gives metric depth along every pano ray, so no
external checkpoint is required to stand the pipeline up end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.models.resnet import RESNET_SPECS, BasicBlock, BottleneckBlock

PANO_H, PANO_W = 512, 1024


class TransformerBlock(nn.Module):
    """Pre-LN transformer block over the width axis."""

    num_heads: int = 8
    mlp_ratio: int = 4
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, W, C)
        c = x.shape[-1]
        y = nn.LayerNorm(dtype=self.compute_dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.compute_dtype
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.compute_dtype)(x)
        y = nn.Dense(c * self.mlp_ratio, dtype=self.compute_dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.compute_dtype)(y)
        return x + y


class _Trunk(nn.Module):
    """ResNet trunk emitting the final (H/32, W/32, C) feature map."""

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
                x = block_cls(filters=64 * 2**i, conv=conv, norm=norm, strides=strides)(x)
        return x  # (B, H/32, W/32, C)


class PanoDepthNet(nn.Module):
    """HoHoNet-style monocular depth for equirectangular panos.

    Call with (B, 512, 1024, 3) RGB in [0,1]; returns (B, 512, 1024) depth
    in meters (positive, via softplus).
    """

    num_layers: int = 50
    embed_dim: int = 512
    num_blocks: int = 4
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        b, in_h, in_w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
        feats = _Trunk(self.num_layers, self.compute_dtype)(rgb, train=train)
        # (B, 16, 32, 2048) for 512x1024 input with ResNet-50.
        _, fh, fw, fc = feats.shape

        # Height compression: column statistics -> 1D sequence over width.
        col = jnp.concatenate(
            [jnp.max(feats, axis=1), jnp.mean(feats, axis=1)], axis=-1
        )  # (B, fw, 2*fc)
        seq = nn.Dense(self.embed_dim, dtype=self.compute_dtype)(col)

        # Horizontal (circular) positional encoding: the pano wraps.
        pos = jnp.arange(fw) / fw * 2 * jnp.pi
        pe = jnp.stack([jnp.sin(pos), jnp.cos(pos)], axis=-1)  # (fw, 2)
        seq = seq + nn.Dense(self.embed_dim, dtype=self.compute_dtype)(
            pe.astype(self.compute_dtype)
        )[None]

        for _ in range(self.num_blocks):
            seq = TransformerBlock(compute_dtype=self.compute_dtype)(seq)
        seq = nn.LayerNorm(dtype=self.compute_dtype)(seq)

        # Column-to-dense decoder: each 1D feature expands to a
        # (in_h, W-upsample) tile of its pano column.
        up_w = in_w // fw  # 32 at full 512x1024 resolution
        rows = in_h
        out = nn.Dense(rows * up_w, dtype=self.compute_dtype, name="dense_decode")(seq)
        out = out.reshape(b, fw, rows, up_w)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, rows, fw * up_w)

        # Smooth the column seams with a small separable refinement conv.
        out = out[..., None]
        out = nn.Conv(16, (5, 5), dtype=self.compute_dtype, name="refine1")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (3, 3), dtype=jnp.float32, name="refine2")(out)
        depth = jax.nn.softplus(out[..., 0].astype(jnp.float32))
        return depth


# ---------------------------------------------------------------------------
# Training-data synthesis: metric depth from ZInD layout geometry.
# ---------------------------------------------------------------------------


def synthesize_depth_from_layout(
    room_vertices: np.ndarray,
    camera_height_m: float,
    ceiling_height_m: float,
    h: int = PANO_H,
    w: int = PANO_W,
) -> np.ndarray:
    """Ray-cast a room layout into a dense (h,w) metric depth map.

    Walls are vertical prisms over the floor polygon; floor at
    -camera_height_m, ceiling at +(ceiling_height_m - camera_height_m).
    Uses the HoHoNet ray convention (geometry.pano_projection.get_uni_sphere_xyz).
    Thin wrapper over rendering.synthetic.raycast_layout (single source of
    truth for the prism intersection math).
    """
    from salve_tpu.rendering.synthetic import raycast_layout

    return raycast_layout(
        np.asarray(room_vertices, dtype=np.float64),
        camera_height_m=camera_height_m,
        ceiling_height_m=ceiling_height_m,
        h=h,
        w=w,
    )["depth"]


def load_depth_provider(ckpt_fpath: str, num_layers: int = 50):
    """Load a trained PanoDepthNet msgpack and wrap it as a depth provider.

    The provider takes (H,W,3) float RGB in [0,1] and returns (H,W) float
    meters — the depth.cache producer contract (the HoHoNet role,
    salve/utils/infer_depth.py:28).
    """
    import flax
    import jax

    from salve_tpu.training.depth import create_depth_train_state

    state = create_depth_train_state(jax.random.PRNGKey(0), num_layers=num_layers)
    with open(ckpt_fpath, "rb") as f:
        restored = flax.serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats}, f.read()
        )
    return make_depth_provider(
        restored["params"], restored["batch_stats"], num_layers=num_layers
    )


def make_depth_provider(params, batch_stats=None, num_layers: int = 50):
    """Wrap trained PanoDepthNet params as a depth.cache producer fn.

    Input contract: (H,W,3) float RGB in [0,1] (depth/cache.py producer
    contract); returns (H,W) float meters.
    """
    model = PanoDepthNet(num_layers=num_layers)

    @jax.jit
    def _infer(rgb):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, rgb[None], train=False)[0]

    def provider(rgb: np.ndarray) -> np.ndarray:
        return np.asarray(_infer(jnp.asarray(rgb, dtype=jnp.float32)))

    return provider
