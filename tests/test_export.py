"""StableHLO serving export: roundtrip + numerics + CLI surface.

Beyond-parity (the reference has no deployment path, PARITY.md): the
exported artifact must reproduce the eval forward bitwise, carry the
weights as constants (no checkpoint needed at load time), and stay
batch-polymorphic when exported with a symbolic batch dim.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medsegpretrainimagenet_tpu import export as mexp
from medsegpretrainimagenet_tpu.models import UNet


@pytest.fixture(scope="module")
def small_unet():
    module = UNet(img_ch=1, output_ch=1, channels=[4, 8], depth=1)
    variables = module.init(jax.random.key(0),
                            jnp.zeros((1, 16, 16, 1)), train=False)
    return module, variables


def test_export_roundtrip_matches_apply(tmp_path, small_unet):
    module, variables = small_unet
    exported = mexp.export_forward(module, variables, (16, 16, 1))
    path = str(tmp_path / "m.shlo")
    nbytes = mexp.save_exported(exported, path)
    assert nbytes == os.path.getsize(path) > 0

    back = mexp.load_exported(path)
    x = np.random.default_rng(0).random((3, 16, 16, 1)).astype(np.float32)
    direct = module.apply(variables, jnp.asarray(x), train=False)
    served = back.call(jnp.asarray(x))
    # the symbolic-batch program is a different XLA program than the
    # static-shape one: reduction order may differ by float ulps
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               atol=1e-6, rtol=0)


def test_export_symbolic_batch_polymorphism(tmp_path, small_unet):
    module, variables = small_unet
    exported = mexp.export_forward(module, variables, (16, 16, 1))
    back = mexp.load_exported(
        (lambda p: (mexp.save_exported(exported, p), p)[1])(
            str(tmp_path / "m.shlo")))
    for b in (1, 5):
        y = back.call(jnp.ones((b, 16, 16, 1), jnp.float32))
        assert y.shape[0] == b


@pytest.mark.slow
def test_export_swin_unet_symbolic_batch():
    """The Swin family (window partition/shift reshapes) must survive
    shape-polymorphic tracing too."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_swin import _swin_unet_kwargs

    m = UNet(**_swin_unet_kwargs())
    v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    exported = mexp.export_forward(m, v, (64, 64, 3))
    y = exported.call(jnp.ones((2, 64, 64, 3), jnp.float32))
    assert y.shape == (2, 64, 64, 1)


def test_export_static_batch_rejects_other_sizes(small_unet):
    module, variables = small_unet
    exported = mexp.export_forward(module, variables, (16, 16, 1), batch=2)
    assert exported.in_avals[0].shape[0] == 2
    with pytest.raises(Exception):
        exported.call(jnp.ones((3, 16, 16, 1), jnp.float32))


def test_export_cli_from_config_and_checkpoint(tmp_path):
    """End-to-end CLI surface: config + msgpack checkpoint -> artifact
    that serves without any model code."""
    import yaml

    from medsegpretrainimagenet_tpu.config import ConfigDict, registry
    from medsegpretrainimagenet_tpu.models import Model
    from medsegpretrainimagenet_tpu.train import checkpoint as ckpt

    cfg = {"model": {"segmentation.models.UNet": {
        "architecture": {"in_channel_size": 1, "out_channel_size": 1,
                         "channels": (4, 8), "depth": 1},
        "final_activation": "sigmoid"}}}
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as fh:
        yaml.dump(cfg, fh)

    cd = ConfigDict(cfg)
    cd.expand()
    registry.fill_spec(cd, "model")
    model = registry.build(cd, key="model", wrapper=Model)
    variables = dict(model.init(jax.random.key(7),
                                jnp.zeros((1, 16, 16, 1)), train=False))
    ck_path = str(tmp_path / "state.msgpack")
    ckpt.save_params_file(ck_path, {"params": variables["params"],
                                    "batch_stats":
                                        variables.get("batch_stats", {})})

    out = str(tmp_path / "model.shlo")
    rc = mexp.main([str(cfg_path), "--checkpoint", ck_path,
                    "--output", out, "--size", "16", "--channels", "1"])
    assert rc == 0 and os.path.isfile(out)

    back = mexp.load_exported(out)
    x = np.random.default_rng(1).random((2, 16, 16, 1)).astype(np.float32)
    direct = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(back.call(jnp.asarray(x))),
                               np.asarray(direct), rtol=0, atol=1e-6)
