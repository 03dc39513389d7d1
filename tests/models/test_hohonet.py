"""HoHoNet port: converter + forward parity vs a real torch module mirror.

The mirror is built from actual torch layers (Conv2d/BatchNorm/
MultiheadAttention/LayerNorm) in the upstream backbone/decode/refine/head
composition; its ``state_dict()`` runs through
``convert_hohonet_state_dict`` and the Flax forward must reproduce the
torch forward on random weights (VERDICT r2 item 4b "Done" condition).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from salve_tpu.models import hohonet  # noqa: E402

HW = (128, 256)  # reduced test resolution (production is 512x1024)


class ConvLayerT(nn.Module):
    def __init__(self, cin, cout, kernel=3, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride, kernel // 2, bias=False)
        self.norm = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu6(self.norm(self.conv(x)))


class HarDBlockT(nn.Module):
    def __init__(self, in_ch, growth_rate, grmul, n_layers):
        super().__init__()
        self.links, layer_out, layer_in, self.out_ch = hohonet._hard_block_plan(
            in_ch, growth_rate, grmul, n_layers
        )
        self.n_layers = n_layers
        self.layers = nn.ModuleList(
            [ConvLayerT(layer_in[j], layer_out[j]) for j in range(n_layers)]
        )

    def forward(self, x):
        feats = [x]
        for layer in range(1, self.n_layers + 1):
            tin = [feats[i] for i in self.links[layer - 1]]
            inp = torch.cat(tin, dim=1) if len(tin) > 1 else tin[0]
            feats.append(self.layers[layer - 1](inp))
        keep = [
            feats[i]
            for i in range(1, self.n_layers + 1)
            if (i % 2 == 1) or (i == self.n_layers)
        ]
        return torch.cat(keep, dim=1)


class BackboneT(nn.Module):
    def __init__(self):
        super().__init__()
        cfg = hohonet.HARDNET68
        self.base_0 = ConvLayerT(3, cfg["first_ch"][0], stride=2)
        self.base_1 = ConvLayerT(cfg["first_ch"][0], cfg["first_ch"][1])
        ch = cfg["first_ch"][1]
        self.down_samp = cfg["down_samp"]
        for i in range(5):
            blk = HarDBlockT(ch, cfg["growth_rate"][i], cfg["grmul"], cfg["n_layers"][i])
            self.add_module(f"block_{i}", blk)
            self.add_module(f"trans_{i}", ConvLayerT(blk.out_ch, cfg["ch_list"][i], kernel=1))
            ch = cfg["ch_list"][i]

    def forward(self, x):
        x = self.base_0(x)
        x = self.base_1(x)
        x = F.max_pool2d(x, 3, 2, 1)
        feats = []
        for i in range(5):
            x = getattr(self, f"block_{i}")(x)
            x = getattr(self, f"trans_{i}")(x)
            if i in (0, 2, 3, 4):
                feats.append(x)
            if self.down_samp[i] == 1:
                x = F.max_pool2d(x, 2, 2)
        return feats


class ConvCompressHT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, (2, 1), 1, bias=False)
        self.norm = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class GlobalHeightConvT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        widths = [cin // 2, cin // 2, cin // 4, cout]
        prev = cin
        for j, w in enumerate(widths):
            self.add_module(f"layer_{j}", ConvCompressHT(prev, w))
            prev = w

    def forward(self, x):
        for j in range(4):
            x = getattr(self, f"layer_{j}")(x)
        return x


class DecodeT(nn.Module):
    def __init__(self, feat_chs, out_w):
        super().__init__()
        self.out_w = out_w

        def _h_after(h):  # four ceil-halving compressions
            for _ in range(4):
                h = (h + 1) // 2
            return h

        total = 0
        for i, c in enumerate(feat_chs):
            self.add_module(f"ghc_{i}", GlobalHeightConvT(c, c // hohonet.HC_DOWN))
            total += (c // hohonet.HC_DOWN) * _h_after(HW[0] // hohonet.FEATURE_STRIDES[i])
        self.proj = nn.Conv1d(total, hohonet.EMB_DIM, 1, bias=False)
        self.proj_norm = nn.BatchNorm1d(hohonet.EMB_DIM)

    def forward(self, feats):
        cols = []
        for i, f in enumerate(feats):
            g = getattr(self, f"ghc_{i}")(f)  # (B, C, H', W)
            b, c, h, w = g.shape
            # Match flax: (B,H',W,C) -> (B,W,H'*C); torch layout is (B,C,H',W)
            # so permute to (B,W,H',C) then flatten (H',C).
            col = g.permute(0, 3, 2, 1).reshape(b, w, h * c).permute(0, 2, 1)
            cols.append(
                F.interpolate(col, size=self.out_w, mode="linear", align_corners=False)
            )
        x = torch.cat(cols, dim=1)  # (B, C_total, W')
        return F.relu(self.proj_norm(self.proj(x)))


class RefineT(nn.Module):
    def __init__(self, seq_len):
        super().__init__()
        e = hohonet.EMB_DIM
        self.pos_embedding = nn.Parameter(torch.randn(1, seq_len, e) * 0.02)
        self.attn = nn.MultiheadAttention(e, hohonet.N_HEADS, batch_first=True)
        self.linear1 = nn.Linear(e, hohonet.FFN_DIM)
        self.linear2 = nn.Linear(hohonet.FFN_DIM, e)
        self.norm1 = nn.LayerNorm(e, eps=1e-5)
        self.norm2 = nn.LayerNorm(e, eps=1e-5)

    def forward(self, x):
        x = x + self.pos_embedding
        ctx, _ = self.attn(x, x, x, need_weights=False)
        x = self.norm1(x + ctx)
        y = self.linear2(F.relu(self.linear1(x)))
        return self.norm2(x + y)


class HeadT(nn.Module):
    def __init__(self, height, out_w):
        super().__init__()
        self.coef = nn.Conv1d(hohonet.EMB_DIM, hohonet.N_DCT_COMPONENTS, 1)
        self.register_buffer(
            "basis",
            torch.tensor(hohonet._idct3_matrix(hohonet.N_DCT_COMPONENTS, height)),
            persistent=False,
        )
        self.out_w = out_w

    def forward(self, x):
        coefs = self.coef(x)  # (B, K, W')
        cols = torch.einsum("bkw,kh->bhw", coefs, self.basis)  # (B, H, W')
        return F.interpolate(cols, size=self.out_w, mode="linear", align_corners=False)


class HoHoNetDepthT(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = BackboneT()
        self.decode = DecodeT(
            feat_chs=(128, 320, 640, 1024), out_w=HW[1] // hohonet.WIDTH_DOWN
        )
        self.refine = RefineT(seq_len=HW[1] // hohonet.WIDTH_DOWN)
        self.head = HeadT(height=HW[0], out_w=HW[1])

    def forward(self, x):
        feats = self.backbone(x)
        hz = self.decode(feats)  # (B, E, W')
        hz = self.refine(hz.permute(0, 2, 1))  # (B, W', E)
        return self.head(hz.permute(0, 2, 1))  # (B, H, W)


def _randomize(module: nn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)


def test_hard_block_plan_channels() -> None:
    """Block widths follow the harmonic growth law (even, grmul-scaled)."""
    links, layer_out, layer_in, out_ch = hohonet._hard_block_plan(64, 14, 1.7, 8)
    assert links[0] == [0] and layer_in[0] == 64 and layer_out[0] == 14
    # Layer 8 links to 7,6,4,0 -> 3 doublings -> 14*1.7^3 rounded to even.
    assert links[7] == [7, 6, 4, 0]
    assert layer_out[7] == int(int(14 * 1.7**3 + 1) / 2) * 2
    # Output keeps odd layers + last.
    assert out_ch == sum(layer_out[i - 1] for i in (1, 3, 5, 7, 8))


def test_hohonet_forward_matches_torch_mirror() -> None:
    tm = HoHoNetDepthT().eval()
    _randomize(tm)
    params, stats = hohonet.convert_hohonet_state_dict(tm.state_dict())

    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (1, HW[0], HW[1], 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(rgb.transpose(0, 3, 1, 2))).numpy()

    model = hohonet.HoHoNetDepth(input_hw=HW)
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(rgb), train=False
    )
    out = np.asarray(out)
    assert out.shape == ref.shape == (1, HW[0], HW[1])
    assert np.allclose(out, ref, atol=5e-3), np.abs(out - ref).max()


def test_converter_rejects_unknown_keys() -> None:
    tm = HoHoNetDepthT().eval()
    sd = tm.state_dict()
    sd["backbone.extra.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconverted"):
        hohonet.convert_hohonet_state_dict(sd)


def test_load_hohonet_depth_provider_pth_roundtrip(tmp_path) -> None:
    """A .pth checkpoint loads into the depth.cache producer contract."""
    tm = HoHoNetDepthT().eval()
    _randomize(tm, seed=1)
    fpath = tmp_path / "ep60.pth"
    torch.save(tm.state_dict(), fpath)

    # Full production resolution is exercised by the converter; here only
    # the load path + conversion strictness need to round-trip.
    params, stats = hohonet.convert_hohonet_state_dict(
        torch.load(fpath, map_location="cpu", weights_only=False)
    )
    assert "backbone" in params and "backbone" in stats
    assert params["head"]["coef"]["kernel"].shape == (
        hohonet.EMB_DIM,
        hohonet.N_DCT_COMPONENTS,
    )


def test_flax_init_structure_matches_converted() -> None:
    import jax

    tm = HoHoNetDepthT().eval()
    params, stats = hohonet.convert_hohonet_state_dict(tm.state_dict())
    model = hohonet.HoHoNetDepth(input_hw=HW)
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW[0], HW[1], 3)), train=False
    )

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), tree)

    assert shapes(ref["params"]) == shapes(params)
    assert shapes(ref["batch_stats"]) == shapes(stats)
