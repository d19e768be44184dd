"""Round-trip every shipped reference YAML through the fill/build pipeline.

This is the acceptance surface of SURVEY.md §5.6: the 15 configs under
``/root/reference/config`` must drive this framework unchanged.  Datasets
are not constructed (no data on disk); everything else is: transform
pipelines, the model (parameter shapes via ``jax.eval_shape``), optimizer +
schedule, loss, and the metrics calculator.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import (ConfigDict,
                                               default_experiment_config,
                                               registry)
from medsegpretrainimagenet_tpu.config.grid import parse
from medsegpretrainimagenet_tpu.cli.run_experiment import (
    build_transform_pipelines)
from medsegpretrainimagenet_tpu.losses import Loss
from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
from medsegpretrainimagenet_tpu.models import Model
from medsegpretrainimagenet_tpu.optim import Optimizer

REFERENCE_CONFIGS = sorted(
    glob.glob("/root/reference/config/**/*.yaml", recursive=True))

pytestmark = pytest.mark.skipif(not REFERENCE_CONFIGS,
                                reason="reference configs not mounted")

def _fill(config_dict: ConfigDict):
    config_dict.expand()
    config_dict.fill_with_defaults(default_experiment_config())
    from medsegpretrainimagenet_tpu.data import BalancedDataLoader
    BalancedDataLoader.fill_kwargs(
        config_dict.get_or_update("data/sampling", ConfigDict()))
    for key in ("model", "training/loss", "data/data"):
        registry.fill_spec(config_dict, key)
    Model.fill_weight_init_kwargs(config_dict["model"].value())
    Optimizer.fill_kwargs(config_dict["training/optimizer"])
    MetricsCalculator.fill_kwargs(config_dict)
    return config_dict


@pytest.mark.parametrize("path", REFERENCE_CONFIGS,
                         ids=[os.path.relpath(p, "/root/reference/config")
                              for p in REFERENCE_CONFIGS])
def test_reference_config_builds(path):
    configs, _ = parse(path)
    assert configs, f"{path} expanded to zero experiments"
    # EVERY grid variant must survive the fill + transform pipeline (the
    # swept encoder-weights/freeze variants differ in weight_init and
    # name_fields, which flow through fill); exact per-variant model
    # parameter counts are covered by tests/test_param_count_parity.py
    for variant in configs:
        cd = _fill(ConfigDict(variant))
        train_tr, val_tr, _, _, _ = build_transform_pipelines(cd, seed=0)
        assert train_tr is not None and val_tr is not None
    cd = _fill(ConfigDict(configs[0]))

    # --- model ----------------------------------------------------------
    model = registry.build(cd["model"].trim(), wrapper=Model)
    size = 224  # every shipped config trains at 224 crops (IDRiD's
    # RandomPick/Partition transforms cut its 448 crops down to 224)
    img_ch = 3
    sample = jnp.zeros((1, size, size, img_ch), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.module.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            sample, train=False))
    n_params = sum(int(np.prod(s.shape)) for s in
                   jax.tree_util.tree_leaves(shapes["params"]))
    assert n_params > 1e5, f"suspiciously small model ({n_params} params)"

    # --- optimizer + schedule --------------------------------------------
    opt = Optimizer(cd["training/optimizer"],
                    num_epochs=cd["experiment/number_of_epochs"],
                    batches_per_epoch=10)
    lr0 = float(opt.lr_at(0))
    assert np.isfinite(lr0) and lr0 > 0

    # --- loss -------------------------------------------------------------
    loss = registry.build(cd["training/loss"].trim(), wrapper=Loss)
    assert callable(loss.calculator) and loss.name

    # --- metrics ----------------------------------------------------------
    calculator = MetricsCalculator(cd, loss=loss)
    state = calculator.init_state()
    assert isinstance(state, dict) and state


def test_all_fifteen_configs_found():
    assert len(REFERENCE_CONFIGS) == 15
