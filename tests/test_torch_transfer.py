"""Pretrained-encoder transfer from reference-format PyTorch checkpoints.

Builds the *actual reference torch encoder* (imported from /root/reference
with its heavy plotting/augmentation deps mocked out), saves its state dict
in the released-checkpoint format (``layers.0.`` FeedForwardModel prefix),
loads it through this framework's transfer path, and checks **numerical
forward parity** between the torch encoder and the flax encoder.
"""
import importlib.abc
import importlib.util
import sys
from unittest.mock import MagicMock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.models import Model, UNet, UNetEncoder
from medsegpretrainimagenet_tpu.models.wrapper import _graft
from medsegpretrainimagenet_tpu.train.checkpoint import (
    load_encoder_params, load_torch_state_dict)
from medsegpretrainimagenet_tpu.train.torch_mapping import (
    looks_like_torch_encoder, translate_reference_encoder)

from conftest import reference_import  # noqa: E402


@pytest.fixture(scope="module")
def reference_encoder_factory():
    """Import the reference torch UNet_encoder with mocked heavy deps."""
    with reference_import("timm.models.layers", "utils",
                          "segmentation.models.blocks",
                          "segmentation.models.unet_models") as (
            tml, ref_utils, ref_blocks, ref_unet):
        # timm is genuinely absent, so its mock gets REAL implementations
        # of the two symbols the reference Swin blocks call
        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std)
            return t

        tml.DropPath = DropPath
        tml.trunc_normal_ = trunc_normal_
        RefCD = ref_utils.config_dict.ConfigDict

        def build(channels=(8, 8, 16), depth=1, width=2):
            bb = RefCD({"segmentation.models.blocks.ConvBlock": {}})
            ref_utils.fill_dict(bb)
            ref_blocks.ConvBlock.fill_kwargs(bb.value())
            return ref_unet.UNet_encoder(
                in_channel_size=3, channels=list(channels), depth=depth,
                width=width,
                stem=RefCD({"torch.nn.Conv2d":
                            {"kernel_size": 3, "padding": "same"}}),
                downsampling=RefCD({"torch.nn.MaxPool2d":
                                    {"kernel_size": 2}}),
                basic_block=bb)

        yield build


def _randomise_torch(module, seed=0):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.15, generator=gen)
        for name, b in module.named_buffers():
            # only BN running stats — other buffers (attn_mask,
            # relative_position_index) are structural
            if "running" in name and b.dtype.is_floating_point:
                b.uniform_(0.5, 1.5, generator=gen)


def test_translate_reference_encoder_forward_parity(
        reference_encoder_factory, tmp_path):
    ref = reference_encoder_factory()
    _randomise_torch(ref)
    ref.eval()

    path = str(tmp_path / "encoder.pt")
    torch.save(ref.state_dict(), path)

    torch_tree = load_torch_state_dict(path)
    assert looks_like_torch_encoder(torch_tree)
    translated, leftover = translate_reference_encoder(torch_tree)
    assert leftover == [], f"unmapped keys: {leftover[:5]}"

    ours = UNetEncoder(in_channel_size=3, channels=[8, 8, 16], depth=1,
                       width=2)
    x = jnp.zeros((2, 16, 16, 3))
    variables = ours.init(jax.random.key(0), x, train=False)
    params = _graft(variables["params"], translated["params"], None)
    stats = _graft(variables["batch_stats"], translated["batch_stats"], None)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    out_flax, skips_flax = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_np), train=False, return_skip_vals=True)

    with torch.no_grad():
        out_torch, skips_torch = ref(
            torch.tensor(x_np.transpose(0, 3, 1, 2)), return_skip_vals=True)

    np.testing.assert_allclose(
        np.array(out_flax), out_torch.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)
    assert len(skips_flax) == len(skips_torch)
    for ours_s, theirs_s in zip(skips_flax, skips_torch):
        np.testing.assert_allclose(
            np.array(ours_s), theirs_s.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_full_transfer_path_through_model_wrapper(
        reference_encoder_factory, tmp_path):
    """Released-checkpoint format: ``layers.0.`` prefix + UNet config path."""
    ref = reference_encoder_factory()
    _randomise_torch(ref, seed=1)
    state = {f"layers.0.{k}": v for k, v in ref.state_dict().items()}
    # plus a classifier head like the real pretraining checkpoints
    state["layers.3.weight"] = torch.zeros(10, 16)
    state["layers.3.bias"] = torch.zeros(10)
    path = str(tmp_path / "pretrained.pt")
    torch.save(state, path)

    model = Model(UNet, ConfigDict({}))
    model.module = UNet(img_ch=3, output_ch=1, depth=1, width=2,
                        channels=[8, 16])
    variables = model.init(jax.random.key(0),
                           {"x": jnp.zeros((1, 16, 16, 3))})
    model_dict = ConfigDict({"weight_init": {"encoder": {
        "weights": path, "strict": False, "pretrained_encoder": True}}})
    loaded = model.init_weight(model_dict, variables, jax.random.key(1))

    # encoder params actually changed and match the torch tensors
    stem_kernel = np.array(loaded["params"]["enc"]["stem_block"]["Conv_0"]
                           ["kernel"])
    torch_stem = ref.state_dict()["first_block.weight"].numpy()
    np.testing.assert_allclose(stem_kernel,
                               torch_stem.transpose(2, 3, 1, 0), rtol=1e-6)
    # batch stats transferred too
    bn_mean = np.array(loaded["batch_stats"]["enc"]["level_convs_0_0"]
                       ["BatchNorm_0"]["mean"])
    torch_mean = ref.state_dict()[
        "down_layers.0.conv0.block.1.running_mean"].numpy()
    np.testing.assert_allclose(bn_mean, torch_mean, rtol=1e-6)
    # decoder untouched
    assert "dec" in loaded["params"]


def test_load_encoder_params_strips_layers0(tmp_path):
    state = {"layers.0.first_block.weight": torch.zeros(4, 3, 3, 3),
             "layers.0.first_block.bias": torch.zeros(4),
             "layers.3.weight": torch.zeros(10, 4)}
    path = str(tmp_path / "ffm.pt")
    torch.save(state, path)
    tree = load_encoder_params(path)
    assert "first_block" in tree
    assert "layers.3.weight" not in str(tree.keys())


def test_swin_encoder_transfer_forward_parity(reference_encoder_factory,
                                              tmp_path):
    """Swin U-Net encoder checkpoints translate and match numerically."""
    import sys
    sys.path.insert(0, "/root/reference/src")
    try:
        import utils as ref_utils
        from segmentation.models import unet_models as ref_unet
        RefCD = ref_utils.config_dict.ConfigDict
        bb = RefCD({"segmentation.models.blocks.SwinTransformerBlock": {
            "img_size": 32, "patch_size": 4, "embed_dim": 8,
            "num_heads_layers": (2, 4), "window_size": 4}})
        ref_utils.fill_dict(bb)
        ref = ref_unet.UNet_encoder(
            in_channel_size=3, channels=[8, 16], depth=1, width=2,
            change_channel_in_block=False, trainable_downsampling=True,
            stem=RefCD({"segmentation.models.blocks.PatchEmbed":
                        {"patch_size": 4}}),
            downsampling=RefCD({"segmentation.models.blocks.PatchMerging":
                                {}}),
            basic_block=bb)
    finally:
        sys.path.remove("/root/reference/src")
    _randomise_torch(ref, seed=3)
    ref.eval()

    path = str(tmp_path / "swin_encoder.pt")
    torch.save(ref.state_dict(), path)
    torch_tree = load_torch_state_dict(path)
    translated, leftover = translate_reference_encoder(torch_tree)
    assert leftover == [], f"unmapped: {leftover[:6]}"

    from medsegpretrainimagenet_tpu.config import ConfigDict
    ours = UNetEncoder(
        in_channel_size=3, channels=[8, 16], depth=1, width=2,
        change_channel_in_block=False, trainable_downsampling=True,
        stem=ConfigDict({"segmentation.models.blocks.PatchEmbed":
                         {"patch_size": 4}}),
        downsampling=ConfigDict({"segmentation.models.blocks.PatchMerging":
                                 {}}),
        basic_block=ConfigDict(
            {"segmentation.models.blocks.SwinTransformerBlock": {
                "img_size": 32, "patch_size": 4, "embed_dim": 8,
                "num_heads_layers": (2, 4), "window_size": 4}}))
    x = jnp.zeros((2, 32, 32, 3))
    variables = ours.init(jax.random.key(0), x, train=False)
    params = _graft(variables["params"], translated["params"], None)

    rng = np.random.default_rng(5)
    x_np = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    out_flax, skips_flax = ours.apply(
        {"params": params}, jnp.asarray(x_np), train=False,
        return_skip_vals=True)
    with torch.no_grad():
        out_torch, skips_torch = ref(
            torch.tensor(x_np.transpose(0, 3, 1, 2)), return_skip_vals=True)
    # both are (B, L, C) token tensors
    np.testing.assert_allclose(np.array(out_flax), out_torch.numpy(),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(skips_flax, skips_torch):
        np.testing.assert_allclose(np.array(a), b.numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_resnet_encoder_transfer_forward_parity(reference_encoder_factory,
                                                tmp_path):
    """DeepResNet encoder checkpoints translate and match numerically."""
    import sys
    sys.path.insert(0, "/root/reference/src")
    try:
        import classification.models as ref_cm
        ref = ref_cm.DeepResNet(version="v1", bottleneck=True,
                                channel_sizes=(8, 16), widths=(1, 2),
                                in_channels=3, base_channel_size=4)
    finally:
        sys.path.remove("/root/reference/src")
    _randomise_torch(ref, seed=7)
    ref.eval()

    path = str(tmp_path / "resnet.pt")
    torch.save(ref.state_dict(), path)
    torch_tree = load_torch_state_dict(path)
    assert looks_like_torch_encoder(torch_tree)
    translated, leftover = translate_reference_encoder(torch_tree)
    assert leftover == [], f"unmapped: {leftover[:6]}"

    from medsegpretrainimagenet_tpu.models import DeepResNet
    ours = DeepResNet(version="v1", bottleneck=True, channel_sizes=(8, 16),
                      widths=(1, 2), in_channels=3, base_channel_size=4)
    x = jnp.zeros((2, 32, 32, 3))
    variables = ours.init(jax.random.key(0), x, train=False)
    params = _graft(variables["params"], translated["params"], None)
    stats = _graft(variables["batch_stats"], translated["batch_stats"],
                   None)

    rng = np.random.default_rng(9)
    x_np = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    out_flax, skips_flax = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np),
        train=False, return_skip_vals=True)
    with torch.no_grad():
        out_torch, skips_torch = ref(
            torch.tensor(x_np.transpose(0, 3, 1, 2)), return_skip_vals=True)
    np.testing.assert_allclose(
        np.array(out_flax), out_torch.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4)
    assert len(skips_flax) == len(skips_torch)
    # every intermediate level too — a mistranslated middle-level kernel
    # can leave the final output plausible while skips are garbage
    for level, (sf, st) in enumerate(zip(skips_flax, skips_torch)):
        np.testing.assert_allclose(
            np.array(sf), st.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4, err_msg=f"skip level {level}")
