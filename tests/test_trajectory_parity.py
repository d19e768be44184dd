"""Whole-loop training-trajectory parity vs the reference torch loop.

Runs the reference's ACTUAL training loop (``train_model.py:132-316``,
imported from ``/root/reference/src`` with only genuinely-absent deps
mocked) and this framework's ``train/loop.py`` on the SAME synthetic
segmentation data (identical fragment lists, no shuffling), the SAME
config (small basic U-Net, DiceLoss, SGD+momentum, poly LR decay per
batch, grad clipping) and — via a torch→flax weight transplant — the
IDENTICAL initial weights.  With gradient accumulation disabled the two
loops are step-for-step numerically equivalent, so per-epoch train
loss/Dice must match to float-accumulation precision over the whole run;
one mis-wired component (loss scaling, optimizer-step boundary, BN
fragment semantics, scheduler stepping, metric epoch aggregation) breaks
it (VERDICT r1 §missing 1).

Known, deliberate deviation — reference gradient-accumulation bug:
``train_model.py:55-58`` calls ``optimizer.zero_grad()`` on the *step*
fragment BEFORE that fragment's backward, wiping all previously
accumulated fragment gradients; combined with the ``loss /
accumulation_scale`` scaling (``loss/loss.py:84-87``) every reference
optimizer step under accumulation uses only the LAST fragment's gradient
divided by the accumulation scale.  (The shipped pretraining configs run
at accumulation 8-11×, so the reference's "4096-batch" pretraining was
effectively 384-512-batch at ~1/8th learning rate.)  This framework
implements true mean-of-fragments accumulation; the second test pins the
deviation: same init, accumulation 2 — ours must converge at least as
fast.  See PARITY.md "Descoped, and why".
"""
import csv
import os

import jax
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict, registry
from medsegpretrainimagenet_tpu.losses import Loss
from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
from medsegpretrainimagenet_tpu.models import Model
from medsegpretrainimagenet_tpu.optim import Optimizer
from medsegpretrainimagenet_tpu.train import TrainState, train_model

from conftest import reference_import
from test_reference_configs import _fill

N_EPOCHS = 6
N_TRAIN, N_VAL = 16, 8
SIZE = 16
TBS = 4                   # fragment (true-batch) size
N_CLASSES = 4             # multiclass variant (ACDC-shaped: bg + 3)
N_CLS = 5                 # classification variant (pretraining-shaped)
DICE = "metrics/dice_index_threshold_0.5"


def _experiment_config(destination: str) -> dict:
    return {
        "model": {"segmentation.models.UNet": {
            "architecture": {
                "in channel size": 1, "out channel size": 1,
                "channels": (8, 16), "depth": 1,
                "activation function": {"final": "sigmoid"}},
            "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
                "a": 0, "mode": "fan_in", "nonlinearity": "relu"}}}}},
        "training": {
            "loss": {"segmentation.losses.DiceLoss": {}},
            "optimizer": {"sgd": {
                "momentum": 0.9, "weight_decay": 0.0,
                "learning_rate": {"optim.scheduler.PolyLearningRateDecay": {
                    "base": 0.05, "exponent": 0.9,
                    "iteration_unit": "batch",
                    "number_of_iterations": "auto"}}}},
            "gradient_clipping": {"max_value": 1.0, "norm": 2.0}},
        "metrics": {"metrics": ("metrics.DiceIndex",),
                    "calculation": {"thresholds": 0.5,
                                    "label_type": "mask"}},
        "experiment": {"number_of_epochs": N_EPOCHS,
                       "number_of_trials": 1},
        "meta": {"technical": {
            "log_to_device": True, "verbose": False,
            "log_best_model": False, "log_last_model": False,
            "absolute_path": destination}},
    }


def _experiment_config_mc(destination: str) -> dict:
    """ACDC-shaped multiclass variant: softmax head over ``N_CLASSES``
    channels, batchwise multiclass DiceLoss (the shipped
    ``config/downstream/acdc/unet.yaml:155-160`` loss spec) and the
    explicit multiclass metric family
    (``multiclass_metrics.py:262,292``)."""
    cd = _experiment_config(destination)
    arch = cd["model"]["segmentation.models.UNet"]["architecture"]
    arch["out channel size"] = N_CLASSES
    arch["activation function"] = {"final": "softmax"}
    cd["training"]["loss"] = {"segmentation.losses.DiceLoss": {
        "batchwise": True, "include_background": True,
        "apply_softmax": False, "smoothing_term": 1.0e-05}}
    # classwise columns stay off: with them on the reference requires the
    # full neptune/plot-export kwargs surface (multiclass_metrics.py:183-189)
    cd["metrics"] = {
        "metrics": ("metrics.multiclass_metrics.DiceIndex",
                    "metrics.multiclass_metrics.Accuracy"),
        "calculation": {"label_type": "mask",
                        "number_of_classes": N_CLASSES,
                        "class_names": ("rv", "myo", "lv"),
                        "log_classwise_dice_idcs": False}}
    return cd


def _experiment_config_cls(destination: str) -> dict:
    """Pretraining-shaped classification variant
    (``config/pretraining/unet_encoder/simple.yaml``, scaled down):
    FeedForwardModel(encoder -> GAP -> Flatten -> Linear), label-smoothed
    CrossEntropy, AdamW with linear-warmup + cosine batch schedule, and
    the multiclass Accuracy/AUROC metric pair."""
    return {
        "model": {"model.FeedForwardModel": {
            "layers": (
                {"segmentation.models.UNet_encoder": {
                    "in_channel_size": 1, "channels": (8, 16),
                    "depth": 1}},
                {"torch.nn.AdaptiveAvgPool2d": {"output_size": 1}},
                "torch.nn.Flatten",
                {"torch.nn.Linear": {"in_features": 16,
                                     "out_features": N_CLS}},
            ),
            "weight_init": {"torch.nn.init.kaiming_normal_": {
                "nonlinearity": "relu"}}}},
        "training": {
            "loss": {"classification.losses.CrossEntropyLoss": {
                "label_smoothing": 0.1, "label_type": "label"}},
            "optimizer": {"torch.optim.AdamW": {
                "learning_rate": {
                    "optim.scheduler.LinearWarmupScheduler": {
                        "base": 0.004, "warmup_length": 2,
                        # numeric T_max: the shipped yaml pins it (92335);
                        # 'auto' only exists on the reference's own
                        # CosineAnnealingLR, not the raw torch one
                        "main_scheduler": {
                            "torch.optim.lr_scheduler.CosineAnnealingLR": {
                                "eta_min": 1.0e-06,
                                "T_max": N_EPOCHS * 4 - 2}},
                        "iteration_unit": "batch"}},
                "betas": (0.9, 0.999), "weight_decay": 0.05}}},
        "metrics": {
            "metrics": ("metrics.multiclass_metrics.Accuracy",
                        "metrics.multiclass_metrics.AUROC"),
            "calculation": {"include_background_in_averages": True,
                            "apply_softmax": True,
                            "number_of_classes": N_CLS,
                            "label_type": "label"}},
        "experiment": {"number_of_epochs": N_EPOCHS,
                       "number_of_trials": 1},
        "meta": {"technical": {
            "log_to_device": True, "verbose": False,
            "log_best_model": False, "log_last_model": False,
            "absolute_path": destination}},
    }


def _patch_ffm(ref_utils, ref_model):
    """Make the reference ``FeedForwardModel`` runnable (PARITY.md): as
    published it can neither be constructed from its own configs (config
    key ``layers`` vs required positional ``threads``,
    ``model/model.py:324``) nor produce a classification output
    (``forward`` fans the SAME input into every layer and returns a list,
    ``model/model.py:327-333`` — a Linear cannot consume a raw image).
    The shim applies the only semantics consistent with the shipped
    pretraining configs and published ImageNet accuracies: sequential
    chaining.  Everything else (loop, loss, optimizer, scheduler,
    metrics) stays the genuine reference code."""
    orig = ref_model.FeedForwardModel

    class FixedFFM(orig):
        @staticmethod
        def fill_kwargs(config_dict):
            key = "threads" if "threads" in config_dict else "layers"
            for layer_dict in config_dict.elements_of(key):
                ref_utils.fill_dict(layer_dict)

        def __init__(self, threads=None, layers=None, *a, **k):
            super().__init__(threads if threads is not None else layers)

        def forward(self, x, *a, **k):
            for layer in self.layers:
                x = layer(x)
            return x

    FixedFFM.__name__ = "FeedForwardModel"
    ref_model.FeedForwardModel = FixedFFM


def _fragments(n, rng):
    """Deterministic learnable data, pre-cut into fragment dicts of TBS."""
    xs, masks = [], []
    for _ in range(n):
        x = rng.random((SIZE, SIZE, 1)).astype(np.float32) * 0.3
        cx, cy = rng.integers(4, SIZE - 4, 2)
        x[cx - 3:cx + 3, cy - 3:cy + 3] += 0.7
        xs.append(x)
        masks.append((x[..., 0] > 0.5).astype(np.int64))
    xs, masks = np.stack(xs), np.stack(masks)
    return [{"x": xs[i:i + TBS], "mask": masks[i:i + TBS]}
            for i in range(0, n, TBS)]


def _fragments_mc(n, rng):
    """Learnable ``N_CLASSES``-way data: each class-c patch carries a
    distinct intensity band so the net can learn intensity -> class."""
    xs, masks = [], []
    for _ in range(n):
        x = rng.random((SIZE, SIZE, 1)).astype(np.float32) * 0.2
        mask = np.zeros((SIZE, SIZE), np.int64)
        for c in range(1, N_CLASSES):
            cx, cy = rng.integers(2, SIZE - 4, 2)
            x[cx:cx + 4, cy:cy + 4] = 0.2 + 0.25 * c
            mask[cx:cx + 4, cy:cy + 4] = c
        xs.append(x)
        masks.append(mask)
    xs, masks = np.stack(xs), np.stack(masks)
    return [{"x": xs[i:i + TBS], "mask": masks[i:i + TBS]}
            for i in range(0, n, TBS)]


def _fragments_cls(n, rng):
    """Classification data with wide margins: class-c images carry mean
    intensity ``0.2*c`` over low noise, so GAP features separate cleanly
    (few argmax near-ties -> tight accuracy parity)."""
    xs, labels = [], []
    for i in range(n):
        label = i % N_CLS       # every TBS=4 batch sees 4 distinct classes
        xs.append(rng.random((SIZE, SIZE, 1)).astype(np.float32) * 0.15
                  + 0.2 * label)
        labels.append(label)
    xs = np.stack(xs)
    # (B, 1): the reference CE loss squeezes dim 1 (classification/
    # losses.py:25), so the loader-side label column is 2-D
    labels = np.asarray(labels, np.int64).reshape(-1, 1)
    return [{"x": xs[i:i + TBS], "label": labels[i:i + TBS]}
            for i in range(0, n, TBS)]


def _transplant_cls(params, tw):
    """Torch -> flax for the FeedForwardModel classifier (encoder under
    ``layers_0``, Linear head under ``layers_3``)."""
    enc, pre = params["layers_0"], "model.layers.0.model."
    enc["stem_block"]["Conv_0"]["kernel"] = _conv_t(
        tw[pre + "first_block.model.weight"])
    enc["stem_block"]["Conv_0"]["bias"] = tw[pre + "first_block.model.bias"]
    _blk(enc["level_convs_0_0"], pre + "down_layers.0.conv0.model", tw)
    _blk(enc["bottom_convs_0"], pre + "bottom_block.conv0.model", tw)
    params["layers_3"]["Dense_0"]["kernel"] = \
        tw["model.layers.3.model.weight"].T
    params["layers_3"]["Dense_0"]["bias"] = tw["model.layers.3.model.bias"]
    return params


def _read_epoch_logs(path):
    with open(path) as fh:
        return list(csv.DictReader(fh))


# ---------------------------------------------------------------------------
# reference runner (actual /root/reference/src/train_model.py loop)
# ---------------------------------------------------------------------------

def _run_reference(tmp_path, seed: int, vbs: int,
                   config_fn=None, frag_fn=None, patch_ref=None):
    """Run the reference loop; returns (epoch_rows, initial_weights)."""
    import torch

    config_fn = config_fn or _experiment_config
    frag_fn = frag_fn or _fragments
    destination = str(tmp_path) + f"/ref_{seed}_{vbs}/"
    os.makedirs(destination + "run", exist_ok=True)
    with reference_import("timm.models.layers", "utils", "model", "optim",
                          "loss", "metrics", "train_model") as (
            tml, ref_utils, ref_model, ref_optim, ref_loss, ref_metrics,
            ref_tm):
        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        tml.DropPath = DropPath
        tml.trunc_normal_ = lambda t, std=1.0, **kw: t
        if patch_ref is not None:
            patch_ref(ref_utils, ref_model)

        # the reference loop swallows exceptions (catch-log-continue);
        # for a parity test any exception means mis-wiring -> raise
        def reraise(e, msg, **kw):
            raise e
        ref_tm.handle_exception = reraise

        cd = ref_utils.ConfigDict(config_fn(destination))
        cd.expand()
        cd.fill_with_defaults(ref_utils.default_dict)
        for key in ("model", "training/loss"):
            ref_utils.fill_dict(cd, key)
        ref_model.Model.fill_weight_init_kwargs(cd["model"].value())
        ref_optim.Optimizer.fill_kwargs(cd["training/optimizer"])
        ref_metrics.MetricsCalculator.fill_kwargs(cd)
        cd = cd.trim()      # run_experiment.py:222 trims before run_exp

        torch.manual_seed(seed)
        nn_model = ref_utils.create_object_from_dict(
            cd, key="model", wrapper_class=ref_model.Model)
        nn_model.init_weight(cd["model"].value())     # run_experiment.py:291
        init_weights = {n: p.detach().numpy().copy()
                        for n, p in nn_model.named_parameters()}

        optimizer = ref_optim.Optimizer(cd["training/optimizer"],
                                        nn_model.parameters())
        scheduler_dict = cd["training/optimizer"].value()["learning_rate"]
        scheduler = ref_utils.create_object_from_dict(
            scheduler_dict,
            wrapper_class=ref_optim.scheduler.SchedulerWrapper,
            optimizer=optimizer, num_epochs=N_EPOCHS,
            batches_per_epoch=N_TRAIN // vbs)
        loss_fn = ref_utils.create_object_from_dict(
            cd, key="training/loss", wrapper_class=ref_loss.Loss)
        calcs = ref_metrics.MetricsCalculator(cd, validate=True,
                                              exp_name="run", loss=loss_fn,
                                              class_names=())

        to_t = lambda frags: [
            {k: torch.as_tensor(np.moveaxis(v, -1, 1) if k == "x" else v)
             for k, v in f.items()} for f in frags]
        train_frags = to_t(frag_fn(N_TRAIN, np.random.default_rng(42)))
        val_frags = to_t(frag_fn(N_VAL, np.random.default_rng(77)))

        ref_tm.train_model(
            nn_model, train_frags, val_frags, None, cd,
            optimizer=optimizer, scheduler=scheduler,
            metrics_and_loss=calcs, name="run",
            virtual_batch_size=vbs, true_batch_size=TBS, verbose=False,
            grad_clip_value=cd.get("training/gradient_clipping/max_value"),
            grad_clip_norm_type=cd.get("training/gradient_clipping/norm"))
    return _read_epoch_logs(destination + "run/epoch_logs.csv"), init_weights


# ---------------------------------------------------------------------------
# this framework's runner (train/loop.py), seeded from the torch weights
# ---------------------------------------------------------------------------

def _conv_t(w):
    return np.moveaxis(w, (0, 1), (3, 2))   # OIHW -> HWIO


def _blk(dst, pfx, tw):
    """One ConvBlock (conv-BN-relu x2): torch ``block.N`` -> flax names."""
    dst["Conv_0"]["kernel"] = _conv_t(tw[pfx + ".block.0.weight"])
    dst["Conv_0"]["bias"] = tw[pfx + ".block.0.bias"]
    dst["BatchNorm_0"]["scale"] = tw[pfx + ".block.1.weight"]
    dst["BatchNorm_0"]["bias"] = tw[pfx + ".block.1.bias"]
    dst["Conv_1"]["kernel"] = _conv_t(tw[pfx + ".block.3.weight"])
    dst["Conv_1"]["bias"] = tw[pfx + ".block.3.bias"]
    dst["BatchNorm_1"]["scale"] = tw[pfx + ".block.4.weight"]
    dst["BatchNorm_1"]["bias"] = tw[pfx + ".block.4.bias"]


def _transplant(params, tw):
    """Torch (OIHW) state -> flax (HWIO) param tree for the test's
    depth-1/(8,16) basic U-Net (same pairing the torch-transfer tests
    use; scoped to this fixed architecture)."""
    conv = _conv_t

    def blk(dst, pfx):
        _blk(dst, pfx, tw)

    p = params
    p["enc"]["stem_block"]["Conv_0"]["kernel"] = conv(
        tw["model.encoder.first_block.model.weight"])
    p["enc"]["stem_block"]["Conv_0"]["bias"] = \
        tw["model.encoder.first_block.model.bias"]
    blk(p["enc"]["level_convs_0_0"],
        "model.encoder.down_layers.0.conv0.model")
    blk(p["enc"]["bottom_convs_0"], "model.encoder.bottom_block.conv0.model")
    blk(p["dec"]["level_convs_0_0"],
        "model.decoder.up_layers.0.conv0.model")
    p["dec"]["upsamples_0"]["Conv_0"]["kernel"] = conv(
        tw["model.decoder.up_layers.0.upsampl.model.convup.1.weight"])
    p["dec"]["upsamples_0"]["Conv_0"]["bias"] = \
        tw["model.decoder.up_layers.0.upsampl.model.convup.1.bias"]
    p["dec"]["final"]["Conv_0"]["kernel"] = conv(
        tw["model.decoder.final_block.model.weight"])
    p["dec"]["final"]["Conv_0"]["bias"] = \
        tw["model.decoder.final_block.model.bias"]
    return p


def _run_ours(tmp_path, seed: int, vbs: int, torch_weights,
              config_fn=None, frag_fn=None, transplant=None):
    import jax.numpy as jnp

    destination = str(tmp_path) + f"/jax_{seed}_{vbs}/"
    os.makedirs(destination + "run", exist_ok=True)
    config_fn = config_fn or _experiment_config
    frag_fn = frag_fn or _fragments
    cd = _fill(ConfigDict(config_fn(destination)))

    model = registry.build(cd["model"].trim(), wrapper=Model)
    variables = dict(model.init(
        jax.random.key(seed),
        {"x": jnp.zeros((1, SIZE, SIZE, 1), jnp.float32)}))
    variables["params"] = (transplant or _transplant)(
        jax.device_get(variables["params"]), torch_weights)

    optimizer = Optimizer(cd["training/optimizer"], num_epochs=N_EPOCHS,
                          batches_per_epoch=N_TRAIN // vbs)
    state = TrainState.create(variables,
                              optimizer.tx.init(variables["params"]),
                              jax.random.key(seed + 1))
    loss = registry.build(cd["training/loss"].trim(), wrapper=Loss)
    calculator = MetricsCalculator(cd, loss=loss)

    train_frags = frag_fn(N_TRAIN, np.random.default_rng(42))
    val_frags = frag_fn(N_VAL, np.random.default_rng(77))

    train_model(model, train_frags, val_frags, None, cd, optimizer, state,
                loss=loss, metrics_and_loss=calculator, name="run",
                virtual_batch_size=vbs, true_batch_size=TBS, verbose=False,
                grad_clip_value=cd.get("training/gradient_clipping/max_value"),
                grad_clip_norm_type=cd.get("training/gradient_clipping/norm"))
    return _read_epoch_logs(destination + "run/epoch_logs.csv")


def test_whole_loop_trajectory_matches_reference_bitwise(tmp_path):
    """No accumulation (VBS == TBS == 4 -> 4 optimizer steps/epoch):
    identical init + data + hyperparams means the reference loop and ours
    must produce the same epoch trajectories to float precision."""
    ref_rows, init_w = _run_reference(tmp_path, seed=0, vbs=TBS)
    our_rows = _run_ours(tmp_path, seed=0, vbs=TBS, torch_weights=init_w)

    # -- epoch_logs schema: every reference column exists here; extras
    #    are only the documented _pooled AUC columns (none in this set)
    #    and the "epoch" resume-seeding key (train/loop.py writes it so
    #    _resume_best_value survives duplicate rows after crash+resume)
    ref_cols = set(ref_rows[0].keys())
    our_cols = set(our_rows[0].keys())
    assert ref_cols <= our_cols, f"missing columns: {ref_cols - our_cols}"
    extras = {c for c in our_cols - ref_cols
              if not c.endswith("_pooled") and c != "epoch"}
    assert not extras, f"undocumented extra columns: {extras}"
    assert len(ref_rows) == len(our_rows) == N_EPOCHS

    for i, (ref_row, our_row) in enumerate(zip(ref_rows, our_rows)):
        assert float(ref_row["learning_rate"]) == pytest.approx(
            float(our_row["learning_rate"]), rel=1e-6), f"epoch {i}"
        # train columns: same forward/backward stream, tight
        for col in (DICE, "dice_loss"):
            assert float(ref_row[col]) == pytest.approx(
                float(our_row[col]), abs=2e-3), f"epoch {i}: {col}"
        # val columns ride on BN running stats (more float accumulation)
        for col in ("val_" + DICE, "val_dice_loss"):
            assert float(ref_row[col]) == pytest.approx(
                float(our_row[col]), abs=8e-3), f"epoch {i}: {col}"

    # the run must have actually learned (guards against a frozen model
    # passing the deltas trivially)
    assert float(our_rows[-1][DICE]) > 2 * float(our_rows[0][DICE])

    # -- batch_logs: same schema, same optimizer-step count, and the
    #    per-step stream matches to float precision
    ref_b = _read_epoch_logs(str(tmp_path) + f"/ref_0_{TBS}/run/batch_logs.csv")
    our_b = _read_epoch_logs(str(tmp_path) + f"/jax_0_{TBS}/run/batch_logs.csv")
    assert set(ref_b[0].keys()) == set(our_b[0].keys())
    assert len(ref_b) == len(our_b) == N_EPOCHS * (N_TRAIN // TBS)
    for i, (a, b) in enumerate(zip(ref_b, our_b)):
        for col in a:
            assert float(a[col]) == pytest.approx(float(b[col]),
                                                  abs=2e-3), \
                f"batch {i}: {col}"


def test_multiclass_trajectory_matches_reference(tmp_path):
    """ACDC-shaped multiclass path, same bitwise setup: softmax head,
    batchwise multiclass DiceLoss, K×K-CM-derived macro Dice + accuracy
    (``multiclass_metrics.py:11,262,292``).  Pins the multiclass wiring
    the binary test cannot see: argmax CM streams, the
    include_background_in_averages default, present-class filtering, and
    mean-of-batches epoch aggregation of the MC metrics."""
    ref_rows, init_w = _run_reference(
        tmp_path, seed=0, vbs=TBS,
        config_fn=_experiment_config_mc, frag_fn=_fragments_mc)
    our_rows = _run_ours(
        tmp_path, seed=0, vbs=TBS, torch_weights=init_w,
        config_fn=_experiment_config_mc, frag_fn=_fragments_mc)

    ref_cols = set(ref_rows[0].keys())
    our_cols = set(our_rows[0].keys())
    assert ref_cols <= our_cols, f"missing columns: {ref_cols - our_cols}"
    extras = {c for c in our_cols - ref_cols
              if not c.endswith("_pooled") and c != "epoch"}
    assert not extras, f"undocumented extra columns: {extras}"
    assert len(ref_rows) == len(our_rows) == N_EPOCHS

    # tolerances: the continuous loss stream is float-accumulation tight;
    # argmax-CM-derived columns carry near-tie pixel-flip noise (one
    # flipped 16x16 pixel moves a small class's dice by ~1/32), so they
    # get a looser pointwise bound PLUS a mean-|delta| tracking bound
    # that a systematic aggregation drift would break
    deltas = {col: [] for col in ref_cols}
    for i, (ref_row, our_row) in enumerate(zip(ref_rows, our_rows)):
        for col in sorted(ref_cols):
            r, o = float(ref_row[col]), float(our_row[col])
            deltas[col].append(abs(o - r))
            if col == "learning_rate":
                assert r == pytest.approx(o, rel=1e-6), f"epoch {i}"
            elif "loss" in col:
                tol = 8e-3 if col.startswith("val_") else 2e-3
                assert r == pytest.approx(o, abs=tol), f"epoch {i}: {col}"
            else:               # argmax-derived CM metrics
                assert r == pytest.approx(o, abs=2e-2), f"epoch {i}: {col}"
    for col, ds in deltas.items():
        assert float(np.mean(ds)) < 8e-3, (col, ds)

    # the run must have actually learned the foreground classes
    mdice = "metrics/mean_dice_index"
    assert float(our_rows[-1][mdice]) > float(our_rows[0][mdice]) + 0.1


def test_classification_trajectory_matches_reference(tmp_path):
    """Pretraining-path parity: FeedForwardModel classifier, smoothed CE,
    AdamW, linear-warmup + cosine batch schedule, multiclass
    Accuracy/AUROC — against the genuine reference loop (with only the
    unrunnable FeedForwardModel container shimmed, see ``_patch_ffm``).
    Pins the CE-smoothing wiring, the AdamW/weight-decay mapping, warmup
    milestone conversion, and the mean-of-batches AUROC epoch stream."""
    ref_rows, init_w = _run_reference(
        tmp_path, seed=0, vbs=TBS, config_fn=_experiment_config_cls,
        frag_fn=_fragments_cls, patch_ref=_patch_ffm)
    our_rows = _run_ours(
        tmp_path, seed=0, vbs=TBS, torch_weights=init_w,
        config_fn=_experiment_config_cls, frag_fn=_fragments_cls,
        transplant=_transplant_cls)

    ref_cols = set(ref_rows[0].keys())
    our_cols = set(our_rows[0].keys())
    assert ref_cols <= our_cols, f"missing columns: {ref_cols - our_cols}"
    extras = {c for c in our_cols - ref_cols
              if not c.endswith("_pooled") and c != "epoch"}
    assert not extras, f"undocumented extra columns: {extras}"
    assert len(ref_rows) == len(our_rows) == N_EPOCHS

    # accuracy quantum is 1/N_TRAIN = 0.0625 (one flipped sample), AUROC's
    # is ~1/(3*4 batches); the continuous CE column is the tight signal.
    # val tolerance is wider than the segmentation tests': under AdamW the
    # pre-BN conv biases receive mathematically-zero gradients (train-mode
    # BN cancels any channel constant) that autodiff realises as ~1e-9
    # float noise, and Adam normalises that noise to full-lr steps in a
    # backend-dependent direction.  Measured after 1 epoch: every weight
    # matches torch to ~1e-7 while exactly the pre-BN biases drift
    # 5e-3..1e-2 — intrinsic chaos (torch-vs-torch across BLAS builds
    # shows the same), invisible in train mode, surfacing only through
    # eval-mode running_mean.  running_var matches to 1e-7
    # (TorchBatchNorm's Bessel-corrected update).
    deltas = {col: [] for col in ref_cols}
    for i, (ref_row, our_row) in enumerate(zip(ref_rows, our_rows)):
        for col in sorted(ref_cols):
            r, o = float(ref_row[col]), float(our_row[col])
            deltas[col].append(abs(o - r))
            if col == "learning_rate":
                assert r == pytest.approx(o, rel=1e-6), f"epoch {i}"
            elif "loss" in col:
                tol = 1.5e-2 if col.startswith("val_") else 2e-3
                assert r == pytest.approx(o, abs=tol), f"epoch {i}: {col}"
            else:
                # val accuracy is quantised at 1/N_VAL = 0.125: one
                # near-tie argmax flip (the same bias chaos above) moves
                # it a full quantum.  Allow one; the mean-|delta| bound
                # below fails if flips are systematic (2+ epochs).
                assert r == pytest.approx(o, abs=1.3e-1), f"epoch {i}: {col}"
    for col, ds in deltas.items():
        assert float(np.mean(ds)) < 2.5e-2, (col, ds)

    # the classifier must actually have learned the intensity -> class map
    acc = "metrics/accuracy"
    assert float(our_rows[-1][acc]) > max(0.4, float(our_rows[0][acc]))


def test_accumulation_deviation_converges_at_least_as_fast(tmp_path):
    """Accumulation 2 (VBS 8 / TBS 4): the reference's zero_grad-order
    bug makes it step with only the last fragment's gradient / 2, so with
    identical init OUR loop (true mean-of-fragments accumulation) must
    reach a lower final train loss — pinning the documented deviation."""
    ref_rows, init_w = _run_reference(tmp_path, seed=0, vbs=2 * TBS)
    our_rows = _run_ours(tmp_path, seed=0, vbs=2 * TBS, torch_weights=init_w)
    ref_final = float(ref_rows[-1]["dice_loss"])
    our_final = float(our_rows[-1]["dice_loss"])
    assert our_final < ref_final, (ref_final, our_final)
    # and both loops still learned
    assert float(ref_rows[-1][DICE]) > float(ref_rows[0][DICE])
