"""HoHoNet monocular-depth architecture in Flax (NHWC, TPU-friendly).

The reference runs HoHoNet ("HOHO_depth_dct_efficienthc_TransEn1_hardnet",
salve/utils/hohonet_inference.py:10, invoked via the vendored loop at
salve/utils/infer_depth.py:28-62) as an external torch repo + checkpoint to
produce the u16-mm depth PNGs every Stage-B render consumes. This module
ports that architecture so a real checkpoint can drive real-imagery depth
through ``convert_hohonet_state_dict``.

Architecture (reconstructed from the HoHoNet paper, CVPR 2021, and the
config name — HarDNet-68 backbone, Efficient Height Compression, 1-layer
transformer encoder refinement, DCT-basis depth head):

  rgb (B,512,1024,3)
    -> HarDNet-68 features at strides 4/8/16/32 (channels 128/320/640/1024)
    -> per-scale height compression (4x stride-(2,1) conv blocks, height/16)
       flattened to channels, widths linearly upsampled to W/4=256, concat
    -> 1x1 conv to emb_dim=256 + BN + ReLU            ("efficienthc")
    -> learned positional embedding + 1 post-LN transformer encoder layer
       (8 heads, FFN 2048, torch.nn.TransformerEncoderLayer semantics)
                                                       ("TransEn1")
    -> 1x1 conv to 64 DCT coefficients per column, inverse DCT-III to a
       512-high column profile, width upsampled x4     ("depth_dct")
    -> depth (B,512,1024) in meters

Fidelity note: the upstream repo is unavailable in this environment, so
layer hyperparameters follow the paper; the converter is strict (every
checkpoint tensor must be consumed, every parameter must be filled) and
fails loudly with shape/key diagnostics if a real checkpoint deviates.
``tests/models/test_hohonet.py`` proves the converter + forward against a
real torch module mirror on random weights.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# HarDNet-68 static configuration (Harmonic DenseNet, ICCV 2019).
# ---------------------------------------------------------------------------

HARDNET68 = {
    "first_ch": (32, 64),
    "ch_list": (128, 256, 320, 640, 1024),
    "growth_rate": (14, 16, 20, 40, 160),
    "grmul": 1.7,
    "n_layers": (8, 16, 16, 16, 4),
    "down_samp": (1, 0, 1, 1, 0),
}

# Strides of the four feature taps consumed by the height compression.
FEATURE_STRIDES = (4, 8, 16, 32)
EMB_DIM = 256
N_HEADS = 8
FFN_DIM = 2048
N_DCT_COMPONENTS = 64
INPUT_HW = (512, 1024)
HC_DOWN = 8          # channel divisor in height compression
WIDTH_DOWN = 4       # horizon-feature width = W / WIDTH_DOWN


def _hard_block_plan(
    in_channels: int, growth_rate: int, grmul: float, n_layers: int
) -> Tuple[List[List[int]], List[int], List[int], int]:
    """Static link/channel plan of a HarDBlock.

    Layer L (1-based) reads the concat of layers L-1, L-2, L-4, ... (those
    with L % 2**i == 0), its width is growth_rate * grmul**(#links-1)
    rounded to even. Block output concatenates the input-excluded odd
    feature maps + the last one.
    """
    out_ch = {0: in_channels}
    links: List[List[int]] = []
    layer_out: List[int] = []
    layer_in: List[int] = []
    for layer in range(1, n_layers + 1):
        ch = float(growth_rate)
        link = []
        for i in range(10):
            dv = 2 ** i
            if layer % dv == 0:
                link.append(layer - dv)
                if i > 0:
                    ch *= grmul
        ch = int(int(ch + 1) / 2) * 2
        out_ch[layer] = ch
        links.append(link)
        layer_out.append(ch)
        layer_in.append(sum(out_ch[i] for i in link))
    block_out = sum(
        out_ch[i]
        for i in range(1, n_layers + 1)
        if (i % 2 == 1) or (i == n_layers)
    )
    return links, layer_out, layer_in, block_out


class ConvLayer(nn.Module):
    """HarDNet conv block: 3x3 conv (no bias) + BN + ReLU6."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.compute_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
            name="norm",
        )(x)
        return jnp.minimum(nn.relu(x), 6.0)


class HarDBlock(nn.Module):
    """Harmonic dense block (log-sparse skip links)."""

    in_ch: int
    growth_rate: int
    grmul: float
    n_layers: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        links, layer_out, _, _ = _hard_block_plan(
            self.in_ch, self.growth_rate, self.grmul, self.n_layers
        )
        feats = [x]
        for layer in range(1, self.n_layers + 1):
            tin = [feats[i] for i in links[layer - 1]]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            feats.append(
                ConvLayer(
                    layer_out[layer - 1],
                    compute_dtype=self.compute_dtype,
                    name=f"layers_{layer - 1}",
                )(inp, train=train)
            )
        keep = [
            feats[i]
            for i in range(1, self.n_layers + 1)
            if (i % 2 == 1) or (i == self.n_layers)
        ]
        return jnp.concatenate(keep, axis=-1)


class HarDNetFeatures(nn.Module):
    """HarDNet-68 trunk returning stride-4/8/16/32 feature maps."""

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        cfg = HARDNET68
        conv = partial(ConvLayer, compute_dtype=self.compute_dtype)
        x = conv(cfg["first_ch"][0], stride=2, name="base_0")(x, train=train)   # s2
        x = conv(cfg["first_ch"][1], name="base_1")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))    # s4

        feats: List[jnp.ndarray] = []
        ch = cfg["first_ch"][1]
        for i in range(5):
            x = HarDBlock(
                ch,
                cfg["growth_rate"][i],
                cfg["grmul"],
                cfg["n_layers"][i],
                compute_dtype=self.compute_dtype,
                name=f"block_{i}",
            )(x, train=train)
            x = conv(cfg["ch_list"][i], kernel=1, name=f"trans_{i}")(x, train=train)
            ch = cfg["ch_list"][i]
            # Taps: 128@s4, 320@s8, 640@s16, 1024@s32 (256@s8 is internal).
            if i in (0, 2, 3, 4):
                feats.append(x)
            if cfg["down_samp"][i] == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class ConvCompressH(nn.Module):
    """Height-halving conv: 3x3 stride (2,1) + BN + ReLU."""

    out_ch: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch,
            (3, 3),
            (2, 1),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.compute_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
            name="norm",
        )(x)
        return nn.relu(x)


class GlobalHeightConv(nn.Module):
    """Four ConvCompressH blocks: height /16, channels in->in/2->in/2->in/4->out."""

    in_ch: int
    out_ch: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [self.in_ch // 2, self.in_ch // 2, self.in_ch // 4, self.out_ch]
        for j, w in enumerate(widths):
            x = ConvCompressH(
                w, compute_dtype=self.compute_dtype, name=f"layer_{j}"
            )(x, train=train)
        return x


def _interp_width_linear(x: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """Linear resample along the width axis (..., W, C), align_corners=False
    (torch F.interpolate mode='linear' semantics)."""
    in_w = x.shape[-2]
    if in_w == out_w:
        return x
    pos = (jnp.arange(out_w) + 0.5) * (in_w / out_w) - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, in_w - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_w - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    xl = jnp.take(x, lo, axis=-2)
    xh = jnp.take(x, hi, axis=-2)
    return xl + (xh - xl) * frac[..., :, None]


class EfficientHeightCompression(nn.Module):
    """Per-scale height compression -> common-width concat -> emb_dim."""

    out_w: int = INPUT_HW[1] // WIDTH_DOWN
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        out_w = self.out_w
        columns = []
        for i, f in enumerate(feats):
            c_in = f.shape[-1]
            g = GlobalHeightConv(
                c_in,
                c_in // HC_DOWN,
                compute_dtype=self.compute_dtype,
                name=f"ghc_{i}",
            )(f, train=train)
            b, h, w, c = g.shape
            # (B, H', W, C) -> (B, W, H'*C): flatten height into channels.
            col = jnp.transpose(g, (0, 2, 1, 3)).reshape(b, w, h * c)
            columns.append(_interp_width_linear(col, out_w))
        x = jnp.concatenate(columns, axis=-1)  # (B, W', sum(h_i*c_i))
        x = nn.Dense(
            EMB_DIM, use_bias=False, dtype=self.compute_dtype, name="proj"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.compute_dtype,
            name="proj_norm",
            axis=-1,
        )(x)
        return nn.relu(x)


class TransEn1(nn.Module):
    """Learned positional embedding + one post-LN transformer encoder layer
    (torch.nn.TransformerEncoderLayer semantics: self-attn -> residual ->
    LN -> FFN(ReLU) -> residual -> LN; dropout inert at inference)."""

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, w, e = x.shape
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (1, w, e), jnp.float32
        )
        x = x + pos.astype(x.dtype)

        qkv_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (e, 3 * e), jnp.float32
        )
        qkv_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,), jnp.float32)
        qkv = x @ qkv_kernel.astype(x.dtype) + qkv_bias.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = e // N_HEADS

        def heads(t):
            return t.reshape(b, w, N_HEADS, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = nn.softmax(attn, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, w, e)
        ctx = nn.Dense(e, dtype=self.compute_dtype, name="out_proj")(ctx)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype, name="norm1")(x + ctx)
        y = nn.Dense(FFN_DIM, dtype=self.compute_dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(e, dtype=self.compute_dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype, name="norm2")(x + y)


def _idct3_matrix(n_components: int, height: int) -> np.ndarray:
    """Orthonormal inverse DCT (DCT-III) basis: (n_components, height)."""
    h = np.arange(height)
    basis = np.zeros((n_components, height), dtype=np.float64)
    basis[0] = 1.0 / np.sqrt(height)
    for k in range(1, n_components):
        basis[k] = np.sqrt(2.0 / height) * np.cos(np.pi * (h + 0.5) * k / height)
    return basis.astype(np.float32)


class DCTDepthHead(nn.Module):
    """Per-column DCT coefficients -> dense depth column -> width upsample."""

    height: int = INPUT_HW[0]
    out_w: int = INPUT_HW[1]
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        coefs = nn.Dense(
            N_DCT_COMPONENTS, dtype=self.compute_dtype, name="coef"
        )(x)  # (B, W', K)
        basis = jnp.asarray(_idct3_matrix(N_DCT_COMPONENTS, self.height))
        cols = jnp.einsum("bwk,kh->bwh", coefs, basis.astype(coefs.dtype))
        # cols is (B, W', H): axis -2 is width, H rides the channel axis.
        cols = _interp_width_linear(cols, self.out_w)  # (B, W, H)
        return cols.transpose(0, 2, 1)  # (B, H, W)


class HoHoNetDepth(nn.Module):
    """Full depth model. Input (B,H,W,3) float in [0,1] -> (B,H,W) meters.

    ``input_hw`` defaults to the production 512x1024 equirect resolution
    (salve/utils/infer_depth.py:51-52 resizes inputs to the config hw).
    """

    input_hw: Tuple[int, int] = INPUT_HW
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        feats = HarDNetFeatures(
            compute_dtype=self.compute_dtype, name="backbone"
        )(x, train=train)
        hz = EfficientHeightCompression(
            out_w=self.input_hw[1] // WIDTH_DOWN,
            compute_dtype=self.compute_dtype,
            name="decode",
        )(feats, train=train)
        hz = TransEn1(compute_dtype=self.compute_dtype, name="refine")(hz, train=train)
        return DCTDepthHead(
            height=self.input_hw[0],
            out_w=self.input_hw[1],
            compute_dtype=self.compute_dtype,
            name="head",
        )(hz).astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch state_dict -> Flax conversion
# ---------------------------------------------------------------------------


def _np_(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_hohonet_state_dict(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Strict torch->Flax conversion for HoHoNetDepth.

    Consumes EVERY tensor in ``sd`` and fails with the offending key on any
    mismatch, so a deviating real checkpoint is detected loudly instead of
    silently mis-mapped. Expected torch naming is the module layout of the
    mirror in tests/models/test_hohonet.py (modeled on upstream HoHoNet's
    ``backbone/decode/refine/head`` composition).
    """
    sd = dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(key):
        return {"kernel": _np_(sd.pop(key)).transpose(2, 3, 1, 0)}

    def bn(prefix):
        p = {"scale": _np_(sd.pop(f"{prefix}.weight")), "bias": _np_(sd.pop(f"{prefix}.bias"))}
        s = {
            "mean": _np_(sd.pop(f"{prefix}.running_mean")),
            "var": _np_(sd.pop(f"{prefix}.running_var")),
        }
        sd.pop(f"{prefix}.num_batches_tracked", None)
        return p, s

    def conv_bn(dst_p, dst_s, name, tprefix):
        p, s = bn(f"{tprefix}.norm")
        dst_p[name] = {"conv": conv(f"{tprefix}.conv.weight"), "norm": p}
        dst_s[name] = {"norm": s}

    # Backbone.
    bb_p: Dict[str, Any] = {}
    bb_s: Dict[str, Any] = {}
    conv_bn(bb_p, bb_s, "base_0", "backbone.base_0")
    conv_bn(bb_p, bb_s, "base_1", "backbone.base_1")
    cfg = HARDNET68
    ch = cfg["first_ch"][1]
    for i in range(5):
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        for j in range(cfg["n_layers"][i]):
            conv_bn(blk_p, blk_s, f"layers_{j}", f"backbone.block_{i}.layers.{j}")
        bb_p[f"block_{i}"], bb_s[f"block_{i}"] = blk_p, blk_s
        conv_bn(bb_p, bb_s, f"trans_{i}", f"backbone.trans_{i}")
        ch = cfg["ch_list"][i]
    params["backbone"], stats["backbone"] = bb_p, bb_s

    # Decode (EHC).
    de_p: Dict[str, Any] = {}
    de_s: Dict[str, Any] = {}
    for i in range(4):
        g_p: Dict[str, Any] = {}
        g_s: Dict[str, Any] = {}
        for j in range(4):
            conv_bn(g_p, g_s, f"layer_{j}", f"decode.ghc_{i}.layer_{j}")
        de_p[f"ghc_{i}"], de_s[f"ghc_{i}"] = g_p, g_s
    # torch Conv1d weight (out, in, 1) -> Dense kernel (in, out).
    de_p["proj"] = {"kernel": _np_(sd.pop("decode.proj.weight"))[:, :, 0].T}
    p, s = bn("decode.proj_norm")
    de_p["proj_norm"], de_s["proj_norm"] = p, s
    params["decode"], stats["decode"] = de_p, de_s

    # Refine (TransEn1). torch MultiheadAttention packs qkv as (3E, E).
    rf: Dict[str, Any] = {
        "pos_embedding": _np_(sd.pop("refine.pos_embedding")),
        "in_proj_kernel": _np_(sd.pop("refine.attn.in_proj_weight")).T,
        "in_proj_bias": _np_(sd.pop("refine.attn.in_proj_bias")),
        "out_proj": {
            "kernel": _np_(sd.pop("refine.attn.out_proj.weight")).T,
            "bias": _np_(sd.pop("refine.attn.out_proj.bias")),
        },
        "linear1": {
            "kernel": _np_(sd.pop("refine.linear1.weight")).T,
            "bias": _np_(sd.pop("refine.linear1.bias")),
        },
        "linear2": {
            "kernel": _np_(sd.pop("refine.linear2.weight")).T,
            "bias": _np_(sd.pop("refine.linear2.bias")),
        },
        "norm1": {
            "scale": _np_(sd.pop("refine.norm1.weight")),
            "bias": _np_(sd.pop("refine.norm1.bias")),
        },
        "norm2": {
            "scale": _np_(sd.pop("refine.norm2.weight")),
            "bias": _np_(sd.pop("refine.norm2.bias")),
        },
    }
    params["refine"] = rf

    # Head: Conv1d (K, E, 1) -> Dense (E, K).
    params["head"] = {
        "coef": {
            "kernel": _np_(sd.pop("head.coef.weight"))[:, :, 0].T,
            "bias": _np_(sd.pop("head.coef.bias")),
        }
    }

    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftover:
        raise ValueError(
            f"unconverted checkpoint tensors (architecture mismatch?): {leftover[:8]}"
        )
    return params, stats


def load_hohonet_depth_provider(
    ckpt_fpath: str, input_hw: Tuple[int, int] = INPUT_HW
):
    """Load a HoHoNet torch checkpoint (ep60.pth of
    mp3d_depth_HOHO_depth_dct_efficienthc_TransEn1_hardnet, fetched by the
    reference's scripts/download_monodepth_model.sh) as a depth provider:
    (512,1024,3) float RGB in [0,1] -> (512,1024) float meters — the
    depth.cache producer contract (salve/utils/hohonet_inference.py:14).

    ``input_hw`` is the resolution the CHECKPOINT was built for (the EHC
    height compression bakes the input height into weight shapes); ep60 is
    the production 512x1024. A reduced-resolution checkpoint still serves
    the cache contract: the pano is resized to input_hw for the network and
    the predicted depth is bilinearly upsampled back to 512x1024.
    """
    import jax
    import torch

    sd = torch.load(ckpt_fpath, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = convert_hohonet_state_dict(sd)
    model = HoHoNetDepth(input_hw=input_hw)

    @jax.jit
    def _infer(rgb):
        if rgb.shape[:2] != tuple(input_hw):
            rgb = jax.image.resize(rgb, (*input_hw, 3), method="linear")
        depth = model.apply(
            {"params": params, "batch_stats": stats}, rgb[None], train=False
        )[0]
        if depth.shape != tuple(INPUT_HW):
            depth = jax.image.resize(depth, INPUT_HW, method="linear")
        return depth

    def provider(rgb: np.ndarray) -> np.ndarray:
        return np.asarray(_infer(jnp.asarray(rgb, dtype=jnp.float32)))

    return provider
