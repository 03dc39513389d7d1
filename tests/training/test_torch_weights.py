"""Torch->Flax checkpoint conversion tests.

Validates the converter numerically: a reference-format state_dict is run
through a functional torch forward (conv/bn/pool built from
torch.nn.functional, mirroring torchvision ResNet semantics) and through
our Flax EarlyFusionCEResnet with the converted weights — logits must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from salve_tpu.models.early_fusion import EarlyFusionCEResnet  # noqa: E402
from salve_tpu.models import torch_weights  # noqa: E402

from salve_tpu.models.resnet import RESNET_SPECS  # noqa: E402

STAGES_18 = RESNET_SPECS[18][1]


def _mk_conv(rng, cout, cin, k):
    return torch.tensor(rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32))


def _mk_bn(rng, c, sd, prefix):
    sd[f"{prefix}.weight"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))
    sd[f"{prefix}.bias"] = torch.tensor(rng.normal(0, 0.1, c).astype(np.float32))
    sd[f"{prefix}.running_mean"] = torch.tensor(rng.normal(0, 0.1, c).astype(np.float32))
    sd[f"{prefix}.running_var"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))


def make_reference_state_dict(rng, n_imgs=2, num_classes=2, num_layers=18):
    """Reference ``EarlyFusionCEResnet(num_layers=...)`` state_dict layout.

    Mirrors torchvision's trunk key layout for both basic (18/34) and
    bottleneck (50/152) blocks — every released SALVe checkpoint is a
    ResNet-152 bottleneck (reference README.md:195-203).
    """
    block_kind, stage_sizes, feature_dim = RESNET_SPECS[num_layers]
    sd = {}
    sd["conv1.weight"] = _mk_conv(rng, 64, 3 * n_imgs, 7)  # widened stem
    # Unused vanilla stem/head entries also present in real checkpoints.
    sd["resnet.conv1.weight"] = _mk_conv(rng, 64, 3, 7)
    sd["resnet.fc.weight"] = torch.zeros((1000, feature_dim))
    sd["resnet.fc.bias"] = torch.zeros(1000)
    _mk_bn(rng, 64, sd, "resnet.bn1")
    cin = 64
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        planes = 64 * 2 ** (stage - 1)
        cout = planes if block_kind == "basic" else planes * 4
        for j in range(n_blocks):
            t = f"resnet.layer{stage}.{j}"
            if block_kind == "basic":
                sd[f"{t}.conv1.weight"] = _mk_conv(rng, planes, cin, 3)
                _mk_bn(rng, planes, sd, f"{t}.bn1")
                sd[f"{t}.conv2.weight"] = _mk_conv(rng, planes, planes, 3)
                _mk_bn(rng, planes, sd, f"{t}.bn2")
            else:
                sd[f"{t}.conv1.weight"] = _mk_conv(rng, planes, cin, 1)
                _mk_bn(rng, planes, sd, f"{t}.bn1")
                sd[f"{t}.conv2.weight"] = _mk_conv(rng, planes, planes, 3)
                _mk_bn(rng, planes, sd, f"{t}.bn2")
                sd[f"{t}.conv3.weight"] = _mk_conv(rng, cout, planes, 1)
                _mk_bn(rng, cout, sd, f"{t}.bn3")
            if cin != cout:
                sd[f"{t}.downsample.0.weight"] = _mk_conv(rng, cout, cin, 1)
                _mk_bn(rng, cout, sd, f"{t}.downsample.1")
            cin = cout
    sd["fc.weight"] = torch.tensor(
        rng.normal(0, 0.05, (num_classes, feature_dim)).astype(np.float32)
    )
    sd["fc.bias"] = torch.tensor(rng.normal(0, 0.05, num_classes).astype(np.float32))
    return sd


def _bn_eval(x, sd, prefix):
    return F.batch_norm(
        x,
        sd[f"{prefix}.running_mean"],
        sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        training=False,
        eps=1e-5,
    )


def torch_forward(sd, x_nchw, num_layers=18):
    """Functional mirror of the reference EarlyFusionCEResnet eval pass.

    Follows torchvision ResNet semantics exactly: basic blocks stride on
    conv1; bottleneck blocks stride on the 3x3 conv2 ("ResNet-B", the
    torchvision variant every released checkpoint was trained with).
    """
    block_kind, stage_sizes, _ = RESNET_SPECS[num_layers]
    x = F.conv2d(x_nchw, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(_bn_eval(x, sd, "resnet.bn1"))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
    cin = 64
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        planes = 64 * 2 ** (stage - 1)
        cout = planes if block_kind == "basic" else planes * 4
        for j in range(n_blocks):
            t = f"resnet.layer{stage}.{j}"
            stride = 2 if (stage > 1 and j == 0) else 1
            res = x
            if block_kind == "basic":
                y = F.relu(_bn_eval(F.conv2d(x, sd[f"{t}.conv1.weight"], stride=stride, padding=1), sd, f"{t}.bn1"))
                y = _bn_eval(F.conv2d(y, sd[f"{t}.conv2.weight"], padding=1), sd, f"{t}.bn2")
            else:
                y = F.relu(_bn_eval(F.conv2d(x, sd[f"{t}.conv1.weight"]), sd, f"{t}.bn1"))
                y = F.relu(_bn_eval(F.conv2d(y, sd[f"{t}.conv2.weight"], stride=stride, padding=1), sd, f"{t}.bn2"))
                y = _bn_eval(F.conv2d(y, sd[f"{t}.conv3.weight"]), sd, f"{t}.bn3")
            if cin != cout:
                res = _bn_eval(F.conv2d(x, sd[f"{t}.downsample.0.weight"], stride=stride), sd, f"{t}.downsample.1")
            x = F.relu(res + y)
            cin = cout
    x = x.mean(dim=(2, 3))
    return x @ sd["fc.weight"].T + sd["fc.bias"]


@pytest.mark.parametrize(
    "num_layers,hw,atol",
    [
        (18, 64, 2e-4),
        (50, 64, 1e-3),   # bottleneck path of the released RN152 ckpts
        (152, 32, 1e-3),  # full released-checkpoint architecture
    ],
)
def test_early_fusion_conversion_matches_torch_forward(num_layers, hw, atol) -> None:
    rng = np.random.default_rng(0)
    sd = make_reference_state_dict(rng, num_layers=num_layers)
    params, batch_stats = torch_weights.convert_early_fusion_state_dict(
        sd, num_layers=num_layers
    )

    imgs = rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
    x1, x2 = imgs[:1], imgs[1:]

    # Torch path: NCHW channel-concat.
    x_nchw = torch.tensor(
        np.concatenate([x1, x2], axis=-1).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        ref_logits = torch_forward(sd, x_nchw, num_layers=num_layers).numpy()

    model = EarlyFusionCEResnet(
        num_layers=num_layers,
        modalities=("ceiling_rgb_texture",),
        compute_dtype=jnp.float32,
    )
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats},
        [jnp.asarray(x1), jnp.asarray(x2)],
        train=False,
    )
    assert np.allclose(np.asarray(logits), ref_logits, atol=atol), (
        np.abs(np.asarray(logits) - ref_logits).max()
    )


def test_converted_tree_matches_flax_init_structure() -> None:
    rng = np.random.default_rng(1)
    sd = make_reference_state_dict(rng)
    params, batch_stats = torch_weights.convert_early_fusion_state_dict(sd, num_layers=18)

    model = EarlyFusionCEResnet(num_layers=18, modalities=("ceiling_rgb_texture",))
    ref = model.init(jax.random.PRNGKey(0), [jnp.zeros((1, 32, 32, 3))] * 2, train=False)

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), tree)

    # conv_init differs in input channels (6 vs 6 here — same arity), so
    # full-tree shape equality must hold exactly.
    assert shapes(ref["params"]) == jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
    assert shapes(ref["batch_stats"]) == jax.tree_util.tree_map(
        lambda a: tuple(np.shape(a)), batch_stats
    )


def test_torchvision_imagenet_conversion_widens_stem() -> None:
    """A vanilla (3-channel) state_dict widens to n_imgs slots, preserving scale."""
    rng = np.random.default_rng(2)
    sd = make_reference_state_dict(rng)
    # Strip to a vanilla torchvision layout: trunk at top level, 3-ch stem.
    vanilla = {k[len("resnet."):]: v for k, v in sd.items() if k.startswith("resnet.")}
    params, batch_stats = torch_weights.convert_torchvision_resnet_state_dict(
        vanilla, num_layers=18, num_input_images=4
    )
    stem = params["ResNet_0"]["conv_init"]["kernel"]
    assert stem.shape == (7, 7, 12, 64)
    # Each 3-channel slot is the ImageNet kernel / 4.
    expected = np.asarray(vanilla["conv1.weight"]).transpose(2, 3, 1, 0) / 4.0
    for s in range(4):
        assert np.allclose(stem[:, :, 3 * s : 3 * s + 3, :], expected)
    assert params["fc"]["kernel"].shape == (512, 2)


@pytest.mark.parametrize("num_layers", [18, 50, 152])
def test_infer_num_layers(num_layers) -> None:
    rng = np.random.default_rng(3)
    sd = make_reference_state_dict(rng, num_layers=num_layers)
    assert torch_weights._infer_num_layers(sd) == num_layers


def test_load_model_checkpoint_accepts_pth(tmp_path) -> None:
    """End-to-end: a reference-format .pth round-trips through load_model_checkpoint."""
    from salve_tpu.training.config import TrainingConfig
    from salve_tpu.training.train import create_train_state, load_model_checkpoint

    rng = np.random.default_rng(4)
    sd = make_reference_state_dict(rng)
    ckpt_fpath = tmp_path / "train_ckpt.pth"
    torch.save({"epoch": 3, "state_dict": sd, "max_epochs": 50}, ckpt_fpath)

    cfg = TrainingConfig(num_layers=18, modalities=("ceiling_rgb_texture",))
    state = create_train_state(cfg, jax.random.PRNGKey(0), max_iter=1)
    state = load_model_checkpoint(str(ckpt_fpath), state)

    stem = state.params["ResNet_0"]["conv_init"]["kernel"]
    assert np.allclose(np.asarray(stem), np.asarray(sd["conv1.weight"]).transpose(2, 3, 1, 0))
