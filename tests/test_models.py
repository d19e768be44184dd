import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.models import (DeepResNet, FeedForwardModel,
                                               UNet)
from medsegpretrainimagenet_tpu.models import blocks as B


def nparams(shapes):
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(shapes))


def shape_init(module, x_shape, **kwargs):
    return jax.eval_shape(
        lambda r, x: module.init(r, x, train=False, **kwargs),
        {"params": jax.random.key(0)}, jnp.zeros(x_shape, jnp.float32))


def real_init(module, x_shape):
    return module.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)},
                       jnp.zeros(x_shape, jnp.float32), train=False)


def test_conv_block_params_and_shape():
    block = B.ConvBlock(in_channels=3, out_channels=8)
    shapes = shape_init(block, (1, 16, 16, 3))
    # conv1 3*8*9+8=224, bn 8+8, conv2 8*8*9+8=584, bn 8+8  -> 840 params
    assert nparams(shapes["params"]) == 840
    variables = real_init(block, (1, 16, 16, 3))
    y = block.apply(variables, jnp.ones((2, 16, 16, 3)), train=False)
    assert y.shape == (2, 16, 16, 8)


def test_conv_block_downsample():
    block = B.ConvBlock(in_channels=4, out_channels=4,
                        downsample_in_block=True)
    variables = real_init(block, (1, 16, 16, 4))
    y = block.apply(variables, jnp.ones((1, 16, 16, 4)), train=False)
    assert y.shape == (1, 8, 8, 4)


def test_upconv_block_doubles_spatial():
    block = B.UpConvBlock(in_channels=8, out_channels=4)
    variables = real_init(block, (1, 8, 8, 8))
    y = block.apply(variables, jnp.ones((1, 8, 8, 8)), train=False)
    assert y.shape == (1, 16, 16, 4)


def test_res_connection_identity_variants():
    zf = B.ResConnection(in_channels=4, out_channels=6, type_config=ConfigDict(
        {"identity": {"expand_method": "fill_with_zeros"}}))
    y = zf.apply({"params": {}}, jnp.ones((1, 4, 4, 4)))
    assert y.shape == (1, 4, 4, 6)
    assert float(y[..., 4:].sum()) == 0.0

    rep = B.ResConnection(in_channels=2, out_channels=4, type_config=ConfigDict(
        {"identity": {"expand_method": "repeat"}}))
    y = rep.apply({"params": {}}, jnp.ones((1, 4, 4, 2)))
    assert y.shape == (1, 4, 4, 4)

    add = B.ResConnection(in_channels=4, out_channels=2, type_config=ConfigDict(
        {"identity": {"contract_method": "add"}}))
    y = add.apply({"params": {}}, 2 * jnp.ones((1, 4, 4, 4)))
    assert y.shape == (1, 4, 4, 2)
    assert float(y[0, 0, 0, 0]) == 4.0

    cut = B.ResConnection(in_channels=4, out_channels=3, type_config=ConfigDict(
        {"identity": {"contract_method": "cut_off"}}))
    y = cut.apply({"params": {}}, jnp.ones((1, 4, 4, 4)))
    assert y.shape == (1, 4, 4, 3)


def test_res_connection_conv():
    conv = B.ResConnection(in_channels=4, out_channels=8,
                           type_config=ConfigDict({"convolution": {}}))
    variables = conv.init({"params": jax.random.key(0)},
                          jnp.ones((1, 4, 4, 4)))
    y = conv.apply(variables, jnp.ones((1, 4, 4, 4)),
                   mutable=["batch_stats"])[0]
    assert y.shape == (1, 4, 4, 8)


def test_unet_small_forward_and_train_mode():
    unet = UNet(channels=[8, 16, 32], depth=2)
    variables = real_init(unet, (1, 16, 16, 3))
    x = jnp.ones((2, 16, 16, 3))
    y = unet.apply(variables, x, train=False)
    assert y.shape == (2, 16, 16, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid head
    y2, updates = unet.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(2)})
    assert "batch_stats" in updates


def test_unet_residual_and_layerscale():
    res = ConfigDict({"down": {"identity": {"expand_method":
                                            "fill_with_zeros"}},
                      "up": {"identity": {"contract_method": "add"}}})
    unet = UNet(channels=[8, 16, 32], depth=2, residual_connections=res,
                layer_scaling=1e-6, stochastic_depth_rate=0.1)
    variables = real_init(unet, (1, 16, 16, 3))
    y, _ = unet.apply(variables, jnp.ones((1, 16, 16, 3)), train=True,
                      mutable=["batch_stats"],
                      rngs={"dropout": jax.random.key(0)})
    assert y.shape == (1, 16, 16, 1)


def test_unet_attention_mixing():
    unet = UNet(channels=[8, 16, 32], depth=2,
                mixing_block="segmentation.models.blocks.AttentionBlock")
    variables = real_init(unet, (1, 16, 16, 3))
    y = unet.apply(variables, jnp.ones((1, 16, 16, 3)), train=False)
    assert y.shape == (1, 16, 16, 1)


def test_basic_unet_golden_param_count():
    """Reference-default basic U-Net (depth 4, channels 64..1024,
    ConvBlock(2x conv3x3+BN), MaxPool, UpConv k2, concat, 1x1 head)."""
    assert nparams(shape_init(UNet(), (1, 32, 32, 3))["params"]) == 31_080_449


def test_resnet50_golden_param_count():
    """Reference DeepResNet-50 w/ head: torchvision resnet50 (25.56M) minus
    the 4 projection convs (zero-fill shortcuts) plus conv biases."""
    model = DeepResNet(head=True, output_size=1000)
    assert nparams(shape_init(model, (1, 64, 64, 3))["params"]) == 22_803_176


def test_resnet_skip_values():
    model = DeepResNet(channel_sizes=(8, 16), widths=(1, 1), bottleneck=True,
                       base_channel_size=4)
    variables = real_init(model, (1, 32, 32, 3))
    out, skips = model.apply(variables, jnp.ones((1, 32, 32, 3)),
                             train=False, return_skip_vals=True)
    assert [s.shape for s in skips] == [(1, 16, 16, 4), (1, 8, 8, 8)]
    assert out.shape == (1, 4, 4, 16)


def test_resnet_as_unet_encoder():
    """External-encoder U-Net (ResNet Attention U-Net config shape)."""
    enc = ConfigDict({"classification.models.DeepResNet": {
        "channel_sizes": (8, 16, 32), "widths": (1, 1, 1),
        "base_channel_size": 4, "head": False}})
    unet = UNet(encoder=enc, depth=2,
                decoder_channels=[16, 8, 4, 2],
                skip_con_channels=[16, 8, 4],
                mixing_block="segmentation.models.blocks.AttentionBlock")
    variables = real_init(unet, (1, 32, 32, 3))
    y = unet.apply(variables, jnp.ones((1, 32, 32, 3)), train=False)
    assert y.shape == (1, 32, 32, 1)


def test_feedforward_chain_and_encoder_subtree():
    cfg = ConfigDict({"layers": (
        {"segmentation.models.UNet_encoder": {"channels": (4, 8, 16),
                                              "depth": 2}},
        {"torch.nn.AdaptiveAvgPool2d": {"output_size": 1}},
        "torch.nn.Flatten",
        {"torch.nn.Linear": {"in_features": 16, "out_features": 10}})})
    FeedForwardModel.fill_kwargs(cfg)
    ffm = FeedForwardModel(threads=cfg["layers"])
    variables = real_init(ffm, (1, 16, 16, 3))
    assert "layers_0" in variables["params"]  # encoder subtree for transfer
    y = ffm.apply(variables, jnp.ones((2, 16, 16, 3)), train=False)
    assert y.shape == (2, 10)


def test_unet_from_reference_yaml_config():
    """Build the model exactly as the shipped downstream config describes."""
    import os
    path = "/root/reference/config/downstream/covidqu/unet.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    from medsegpretrainimagenet_tpu.config import parse, registry
    from medsegpretrainimagenet_tpu.models import Model
    configs, _ = parse(path)
    cd = ConfigDict(configs[0])
    cd.expand()
    registry.fill_spec(cd["model"])
    model = registry.build(cd["model"], wrapper=Model)
    # tiny input is enough: conv nets are size-agnostic; use eval_shape
    shapes = jax.eval_shape(
        lambda r, x: model.module.init(r, x, train=False),
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)))
    assert nparams(shapes["params"]) == 31_080_449


def test_param_and_flop_counting(tmp_path):
    """Model.get_num_params / get_number_of_flops (reference
    model/model.py:257-276, via XLA cost analysis instead of fvcore)."""
    import jax.numpy as jnp

    from medsegpretrainimagenet_tpu.config import ConfigDict
    from medsegpretrainimagenet_tpu.models import Model, UNet

    model = Model(UNet, ConfigDict({}))
    model.module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = model.init(jax.random.key(0),
                           {"x": jnp.zeros((1, 16, 16, 1))})
    n = model.get_num_params(variables)
    expected = sum(p.size for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert n == expected
    flops = model.get_number_of_flops(variables, jnp.zeros((1, 16, 16, 1)))
    if flops is not None:  # backend-dependent cost analysis
        # at least the stem conv's MACs
        assert flops > 2 * 16 * 16 * 9 * 4


def test_trunc_normal_uses_absolute_cutoffs():
    """timm trunc_normal_(std=0.02, a=-2, b=2) is effectively untruncated
    (cutoffs are absolute, +/-100 sigma) -> realised std == 0.02, not the
    ~12% smaller +/-2-sigma-truncated value."""
    from medsegpretrainimagenet_tpu.models.init import _trunc_normal

    sampler = _trunc_normal(mean=0.0, std=0.02, a=-2.0, b=2.0)
    x = np.asarray(sampler(jax.random.key(0), (200_000,)))
    assert abs(float(x.std()) - 0.02) < 0.0005
    assert abs(float(x.mean())) < 0.001


def test_weight_init_scheme_list_applies_first_resolvable():
    from medsegpretrainimagenet_tpu.config import ConfigDict as CD
    from medsegpretrainimagenet_tpu.models.init import apply_init

    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)),
                       "bias": jnp.ones((8,))}}
    out = apply_init(params, CD({"otherwise": ["he normal",
                                               "glorot uniform"]}),
                     jax.random.key(0))
    kernel = np.asarray(out["conv"]["kernel"])
    assert kernel.std() > 0  # resampled, not left at zeros
    assert np.allclose(np.asarray(out["conv"]["bias"]), 0.0)  # bias_init 0


def test_path_form_weight_init_loads_checkpoint(tmp_path):
    """weight_init whose single key IS a checkpoint path (reference
    model.py:105-111) must load those weights, not be mistaken for an
    unknown random scheme and silently skipped."""
    from medsegpretrainimagenet_tpu.models import Model
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    def build():
        m = Model(UNet, ConfigDict())
        m.module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
        return m

    model = build()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    path = str(tmp_path / "pretrained.msgpack")
    ckpt.save_params_file(path, variables)

    fresh = build()
    fresh_vars = fresh.init(jax.random.key(42), jnp.zeros((1, 16, 16, 1)))
    # different seed -> at least one (kernel) leaf differs before loading
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree_util.tree_leaves(fresh_vars["params"]),
                        jax.tree_util.tree_leaves(variables["params"])))

    cfg = ConfigDict({"weight_init": {path: {}}})
    cfg.expand()
    loaded = fresh.init_weight(cfg, fresh_vars, jax.random.key(1))
    for got, want in zip(jax.tree_util.tree_leaves(loaded["params"]),
                         jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_swin_bias_table_realised_std():
    """relative_position_bias_table follows timm trunc_normal_ semantics:
    realised std 0.02, not the 12%-smaller 2-sigma-truncated value."""
    from medsegpretrainimagenet_tpu.models.swin import _trunc02

    x = np.asarray(_trunc02(jax.random.key(0), (200_000,)))
    assert abs(float(x.std()) - 0.02) < 0.0005


def test_layer_scale_preserves_bf16():
    module = B.LayerScale(n_channels=8)
    x = jnp.ones((2, 4, 4, 8), jnp.bfloat16)
    variables = module.init(jax.random.key(0), x)
    out = module.apply(variables, x)
    assert out.dtype == jnp.bfloat16
    # param itself stays f32
    assert variables["params"]["scale"].dtype == jnp.float32


def test_torch_batchnorm_running_stats_match_torch():
    """TorchBatchNorm's running stats follow torch exactly: biased batch
    variance for normalization, UNBIASED (Bessel n/(n-1)) accumulated
    into running_var (torch.nn.modules.batchnorm semantics; plain flax
    stores the biased one).  Eval output then matches torch BN given the
    same affine params."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((4, 8, 16, 16)).astype(np.float32) * 1.7 + 0.3
          for _ in range(4)]

    tbn = torch.nn.BatchNorm2d(8)
    tbn.train()
    with torch.no_grad():
        for x in xs:
            tbn(torch.as_tensor(x))
    tbn.eval()
    xe = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        yt = tbn(torch.as_tensor(xe)).numpy()

    bn = B.TorchBatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
    xs_j = [jnp.asarray(np.moveaxis(x, 1, -1)) for x in xs]
    variables = bn.init(jax.random.key(0), xs_j[0])
    state = variables["batch_stats"]
    for x in xs_j:
        _, upd = bn.apply({"params": variables["params"],
                           "batch_stats": state}, x,
                          mutable=["batch_stats"])
        state = upd["batch_stats"]

    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.numpy(), atol=1e-6)

    bne = B.TorchBatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5)
    yj = bne.apply({"params": variables["params"], "batch_stats": state},
                   jnp.asarray(np.moveaxis(xe, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(yj), -1, 1), yt,
                               atol=2e-6)

    # param-tree naming stays plain-flax ("BatchNorm_N") for checkpoint
    # and torch-transfer compatibility
    assert B.TorchBatchNorm.__name__ == "BatchNorm"
