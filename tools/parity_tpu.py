"""TPU-backend trajectory-parity artifact: writes ``PARITY_TPU.json``.

The suite's whole-loop trajectory parity vs the reference torch loop
(``tests/test_trajectory_parity.py``) runs on the CPU mesh only; this
tool closes the remaining gap (VERDICT r2 §missing 2): do the SAME
trajectories hold on the real TPU backend, and what does bf16 mixed
precision cost in metric terms?  Real datasets are not mounted in this
environment, so a synthetic trajectory is the obtainable maximum — the
acceptance proxy is BASELINE.json's "Dice within 0.005".

For EACH of the reference's three downstream model families (basic
U-Net, Swin U-Net — whose tpu/bf16 val pass dispatches to the Pallas
window-attention kernel — and ResNet-attention U-Net; select via
``TRAJ_MODELS=unet,swin_unet,resnet_attention_unet``), three children
(one per backend/precision — the JAX platform is process-global) run
the identical experiment:

* ``cpu/f32``  — the reference trace (the suite pins this trace equal to
  the actual torch loop's, so it inherits that chain of evidence)
* ``tpu/f32``  — same program on the TPU backend: any delta is
  backend numerics (conv algorithms, reduction orders)
* ``tpu/bf16`` — the production configuration
  (``meta/technical/mixed_precision``): delta vs tpu/f32 is the
  mixed-precision cost in trajectory terms

Identical trajectories are possible at all because JAX's threefry PRNG
is backend-deterministic: the same seed yields bit-identical initial
weights and dropout streams on CPU and TPU, so the only divergence
sources are kernel numerics — exactly what this artifact measures.

Usage (from the repo root, with the TPU tunnel healthy)::

    python tools/parity_tpu.py            # writes PARITY_TPU.json

The experiment mirrors ``tests/test_trajectory_parity.py``'s downstream
shape (small basic U-Net + BN, DiceLoss, SGD + momentum, poly LR decay
per batch, grad clipping, per-epoch val pass on held-out data) —
reference loop being matched: ``/root/reference/src/train_model.py``.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EPOCHS = 6
N_TRAIN, N_VAL = 16, 8
SIZE = 32
TBS = 4
DICE = "metrics/dice_index_threshold_0.5"

#: Per-family scale overrides (r5, VERDICT r4 #5): the flagship
#: basic-U-Net family runs at the DEPLOYMENT resolution — 256², the
#: headline bench / BASELINE / covidqu-config size — with 32 train
#: images over 6 epochs (the 128² r4 run predicted the deltas keep
#: collapsing with scale; this closes the chain at full resolution).
#: swin_unet moves off its 32² toy pin to 64² (img_size now follows the
#: scale — window 4 => masked SW-MSA at R=16); resnet_attention stays
#: toy (its capacity floor was tuned there).  ``TRAJ_FORCE_TOY=1``
#: forces toy scale everywhere (fast smoke).
FAMILY_SCALE = {
    "unet": {"epochs": 6, "train": 32, "val": 8, "size": 256, "tbs": 4},
    "swin_unet": {"size": 64},
}
_TOY_SCALE = {"epochs": N_EPOCHS, "train": N_TRAIN, "val": N_VAL,
              "size": SIZE, "tbs": TBS}


def _scale_for(model: str) -> dict:
    if os.environ.get("TRAJ_FORCE_TOY") == "1":
        return dict(_TOY_SCALE)
    return {**_TOY_SCALE, **FAMILY_SCALE.get(model, {})}


#: model families: toy-scale versions of the reference's three downstream
#: architectures (config/downstream/covidqu/{unet,swin_unet,
#: resnet50_attention_unet}.yaml).  swin_unet matters beyond breadth: its
#: bf16 child's no-grad val forward dispatches to the Pallas
#: window-attention kernel on TPU (ops/window_attention.py), so that
#: family's trajectory covers the custom-kernel path inside a full model.
MODELS = {
    "unet": (1, {"segmentation.models.UNet": {
        "architecture": {
            "in channel size": 1, "out channel size": 1,
            "channels": (8, 16), "depth": 1,
            "activation function": {"final": "sigmoid"}},
        "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
            "a": 0, "mode": "fan_in", "nonlinearity": "relu"}}}}}),
    "swin_unet": (3, {"segmentation.models.UNet": {
        "architecture": {
            "activation_function": {"final": "sigmoid"},
            "mixing_block": {
                "segmentation.models.blocks.ConcatLinearBlock": {
                    "halve_channels": True, "pass_all_input": True}},
            "basic_block": {
                "segmentation.models.blocks.SwinTransformerBlock": {
                    # img_size is substituted with the family scale's
                    # size at build time (_experiment_config)
                    "img_size": None, "patch_size": 4, "embed_dim": 8,
                    "num_heads_layers": (2, 4), "window_size": 4}},
            "channels": (8, 16), "change_channels_in_block": False,
            "depth": 1, "width": 2,
            "downsampling": {
                "segmentation.models.blocks.PatchMerging": {}},
            "final_block": {
                "segmentation.models.blocks.FinalPatchExpand_X4": {
                    "dim_scale": 4}},
            "in_channel_size": 3, "out_channel_size": 1,
            "trainable_downsampling": True,
            "stem": {"segmentation.models.blocks.PatchEmbed": {
                "patch_size": 4}},
            "upsampling": {"segmentation.models.blocks.PatchExpand": {
                "dim_scale": 2}},
            "stochastic_depth_rate": 0.1},
        "weight_init": {"random": {"timm.models.layers.trunc_normal_": {
            "std": 0.02}}}}}),
    "resnet_attention_unet": (3, {"segmentation.models.UNet": {
        "architecture": {
            "activation_function": {"final": "sigmoid"},
            "encoder": {"classification.models.DeepResNet": {
                "version": "v1", "bottleneck": True,
                # capacity floor measured on CPU: at (8,16)/base 4 with
                # decoder (8,4,4) the sigmoid outputs never cross the
                # 0.5 threshold in 6 epochs (val Dice constant 0.0007 —
                # a vacuous parity proxy); this sizing reaches ~0.71
                "channel_sizes": (16, 32), "widths": (1, 1),
                "in_channels": 3, "base_channel_size": 8}},
            "mixing_block": {
                "segmentation.models.blocks.AttentionBlock": {}},
            # depth+1 decoder ups (reference real config: 5 entries for
            # the depth-4 resnet50): the extra up undoes the stem's /2
            "out_channel_size": 1, "decoder_channels": (16, 8, 8)},
        "weight_init": {"random": {"torch.nn.init.kaiming_normal_": {
            "nonlinearity": "relu"}}}}}),
}


def _experiment_config(destination: str, model: str) -> dict:
    import copy
    scale = _scale_for(model)
    model_cfg = copy.deepcopy(MODELS[model][1])
    if model == "swin_unet":
        arch = model_cfg["segmentation.models.UNet"]["architecture"]
        arch["basic_block"][
            "segmentation.models.blocks.SwinTransformerBlock"][
            "img_size"] = scale["size"]
    return {
        "model": model_cfg,
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
        "experiment": {"number_of_epochs": scale["epochs"],
                       "number_of_trials": 1},
        "meta": {"technical": {
            "log_to_device": True, "verbose": False,
            "log_best_model": False, "log_last_model": False,
            "maximum_actual_batch_size": scale["tbs"],
            "absolute path": destination, "seed": 0}},
    }


def _fragments(n: int, rng, channels: int = 1, size: int = SIZE,
               tbs: int = TBS) -> list:
    """Deterministic host-side fragment list (no loader shuffling): blobby
    masks with enough signal that the model actually learns."""
    import numpy as np
    frags = []
    for i in range(0, n, tbs):
        x = rng.random((tbs, size, size, channels)).astype(np.float32)
        yy, xx = np.mgrid[:size, :size]
        masks = []
        for _ in range(tbs):
            cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
            r = rng.integers(size // 6, size // 3)
            masks.append(((yy - cy) ** 2 + (xx - cx) ** 2 < r * r))
        mask = np.stack(masks).astype(np.int32)
        x[..., 0] += mask * 0.8
        frags.append({"x": x, "mask": mask})
    return frags


def _run_child() -> None:
    """Run the trajectory on THIS process's backend/precision and print
    the epoch rows as one JSON line."""
    backend = os.environ["TRAJ_BACKEND"]
    precision = os.environ["TRAJ_PRECISION"]
    model_name = os.environ.get("TRAJ_MODEL", "unet")
    channels = MODELS[model_name][0]
    scale = _scale_for(model_name)
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import csv
    import tempfile

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from medsegpretrainimagenet_tpu.config import ConfigDict, registry
    from medsegpretrainimagenet_tpu.config.defaults import (
        default_experiment_config)
    from medsegpretrainimagenet_tpu.losses import Loss
    from medsegpretrainimagenet_tpu.metrics import MetricsCalculator
    from medsegpretrainimagenet_tpu.models import Model
    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype
    from medsegpretrainimagenet_tpu.optim import Optimizer
    from medsegpretrainimagenet_tpu.train import TrainState, train_model

    if precision == "bf16":
        set_compute_dtype(jnp.bfloat16)

    destination = tempfile.mkdtemp(prefix="parity_tpu_") + "/"
    os.makedirs(destination + "run", exist_ok=True)
    cd = ConfigDict(_experiment_config(destination, model_name))
    cd.expand()
    cd.fill_with_defaults(default_experiment_config())
    for key in ("model", "training/loss"):
        registry.fill_spec(cd, key)
    Model.fill_weight_init_kwargs(cd["model"].value())
    Optimizer.fill_kwargs(cd["training/optimizer"])
    MetricsCalculator.fill_kwargs(cd)

    model = registry.build(cd["model"].trim(), wrapper=Model)
    variables = dict(model.init(
        jax.random.key(0),
        {"x": jnp.zeros((1, scale["size"], scale["size"], channels),
                        jnp.float32)}))
    variables = model.init_weight(cd["model"].value(), variables,
                                  jax.random.key(1))

    optimizer = Optimizer(cd["training/optimizer"],
                          num_epochs=scale["epochs"],
                          batches_per_epoch=scale["train"] // scale["tbs"])
    state = TrainState.create(variables,
                              optimizer.tx.init(variables["params"]),
                              jax.random.key(2))
    loss = registry.build(cd["training/loss"].trim(), wrapper=Loss)
    calculator = MetricsCalculator(cd, loss=loss)

    train_model(model,
                _fragments(scale["train"], np.random.default_rng(42),
                           channels, scale["size"], scale["tbs"]),
                _fragments(scale["val"], np.random.default_rng(77),
                           channels, scale["size"], scale["tbs"]),
                None, cd,
                optimizer, state, loss=loss, metrics_and_loss=calculator,
                name="run", virtual_batch_size=scale["tbs"],
                true_batch_size=scale["tbs"],
                verbose=False,
                grad_clip_value=cd.get(
                    "training/gradient_clipping/max_value"),
                grad_clip_norm_type=cd.get(
                    "training/gradient_clipping/norm"))

    with open(destination + "run/epoch_logs.csv") as fh:
        rows = list(csv.DictReader(fh))
    device_kind = jax.devices()[0].device_kind
    print("TRAJ_RESULT " + json.dumps({
        "backend": backend, "precision": precision, "model": model_name,
        "device_kind": device_kind,
        "rows": [{k: float(v) for k, v in row.items()} for row in rows]}),
        flush=True)


def _cache_path(backend: str, precision: str, model: str) -> str:
    """Per-child trajectory cache: trajectories are deterministic given
    (model, backend, precision, scale), so a tunnel drop mid-run only
    costs the children not yet measured — re-runs replay the finished
    ones (the flaky-tunnel lesson: never re-pay a CPU child's minutes,
    or a finished TPU child's tunnel window, for a later child's
    failure).  Keyed additionally by the scale dict so FAMILY_SCALE
    changes invalidate entries.  TRAJ_NO_CACHE=1 disables."""
    import hashlib
    scale = json.dumps(_scale_for(model), sort_keys=True)
    key = hashlib.sha256(scale.encode()).hexdigest()[:10]
    return f"/tmp/traj_cache_{model}_{backend}_{precision}_{key}.json"


def _spawn(backend: str, precision: str, model: str = "unet",
           timeout_s: float = 1500):
    cache = _cache_path(backend, precision, model)
    if os.environ.get("TRAJ_NO_CACHE") != "1":
        try:
            with open(cache) as fh:
                result = json.load(fh)
            if len(result["rows"]) == _scale_for(model)["epochs"]:
                print(f"  (cached: {cache})", flush=True)
                return result
        except (OSError, ValueError, KeyError):
            pass
    env = {**os.environ, "TRAJ_BACKEND": backend,
           "TRAJ_PRECISION": precision, "TRAJ_MODEL": model,
           "TRAJ_CHILD": "1"}
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout_s)
    for line in proc.stdout.splitlines():
        if line.startswith("TRAJ_RESULT "):
            result = json.loads(line[len("TRAJ_RESULT "):])
            # the training loop's error envelope can swallow an epoch
            # (rc 0, fewer CSV rows); zip() would then silently compare
            # mismatched epochs in _summarize
            expected = _scale_for(model)["epochs"]
            if len(result["rows"]) != expected:
                raise RuntimeError(
                    f"{backend}/{precision}/{model} logged "
                    f"{len(result['rows'])} epoch rows, expected "
                    f"{expected} — an epoch died inside the error "
                    "envelope; trajectory unusable")
            if os.environ.get("TRAJ_NO_CACHE") != "1":
                try:
                    with open(cache, "w") as fh:
                        json.dump(result, fh)
                except OSError:
                    pass
            return result
    raise RuntimeError(
        f"{backend}/{precision} child failed rc={proc.returncode}: "
        f"{proc.stderr[-800:]}")


def _max_delta(rows_a, rows_b, col: str) -> float:
    return max(abs(a[col] - b[col]) for a, b in zip(rows_a, rows_b))


def _summarize(trajectories: dict, device_kind: str) -> dict:
    """Derive the per-family summary fields from the three epoch-row
    trajectories (split out so ``--rederive`` can recompute a committed
    artifact's summary without re-measuring)."""
    cols = ("dice_loss", DICE, "val_dice_loss", "val_" + DICE)
    cpu, tpu32, tpu16 = (trajectories["cpu_f32"], trajectories["tpu_f32"],
                         trajectories["tpu_bf16"])
    deltas = {
        "tpu_f32_vs_cpu_f32": {c: _max_delta(tpu32, cpu, c) for c in cols},
        "tpu_bf16_vs_tpu_f32": {c: _max_delta(tpu16, tpu32, c)
                                for c in cols},
        "tpu_bf16_vs_cpu_f32": {c: _max_delta(tpu16, cpu, c) for c in cols},
    }
    # The BASELINE.json acceptance proxy is "downstream Dice within 0.005",
    # and the reference's acceptance surface is results/downstream_scores.csv
    # — an END-of-training score (/root/reference/README.md:121-129).  The
    # final-epoch val-Dice delta is therefore the right analog; max-over-
    # epochs deltas (reported above) include mid-training trajectory chaos
    # whose floor is set by f32-vs-f32 cross-backend kernel numerics, not
    # by bf16 — the f32 floor is recorded alongside for that comparison.
    vcol = "val_" + DICE
    # degeneracy guard: a proxy on a metric that never moves (e.g. a toy
    # model whose sigmoid outputs never cross the threshold) passes
    # vacuously — refuse to produce such an artifact
    for key, rows in (("cpu_f32", cpu), ("tpu_f32", tpu32),
                      ("tpu_bf16", tpu16)):
        vals = [r[vcol] for r in rows]
        if max(vals) - min(vals) < 1e-4:
            raise RuntimeError(
                f"{key} trajectory's {vcol} is constant ({vals[0]:.4f}) "
                "over training — the acceptance proxy would be vacuous; "
                "fix the toy config so the model actually learns")
    proxy = abs(tpu16[-1][vcol] - tpu32[-1][vcol])
    f32_floor = abs(tpu32[-1][vcol] - cpu[-1][vcol])
    return {
        "device_kind": device_kind,
        "max_abs_epoch_deltas": deltas,
        "bf16_val_dice_delta": proxy,
        "acceptance_proxy": {
            "metric": "final-epoch val dice delta, bf16 vs f32 (TPU)",
            "threshold": 0.005, "value": proxy,
            "f32_cross_backend_floor": f32_floor,
            "pass": bool(proxy <= 0.005)},
        "trajectories": trajectories,
    }


def _run_family(model: str) -> dict:
    results = {}
    for backend, precision in (("cpu", "f32"), ("tpu", "f32"),
                               ("tpu", "bf16")):
        key = f"{backend}_{precision}"
        print(f"running {model} {key} trajectory...", flush=True)
        results[key] = _spawn(backend, precision, model)
        print(f"  {model} {key}: final {DICE} = "
              f"{results[key]['rows'][-1][DICE]:.4f}", flush=True)
    fam = _summarize({k: v["rows"] for k, v in results.items()},
                     results["tpu_f32"]["device_kind"])
    # stamp the scale the trajectories were MEASURED at — the artifact's
    # config block reads this, so families carried over from an older
    # artifact (or rederived) keep their true provenance even if
    # FAMILY_SCALE changes later
    fam["scale"] = _scale_for(model)
    return fam


def _artifact_scale(fam: dict) -> dict:
    """The scale to LABEL a family with in the artifact's config block:
    its measured-at ``scale`` stamp.  Pre-stamp legacy entries were all
    measured before ``FAMILY_SCALE`` existed, i.e. at toy scale —
    falling back to the CURRENT ``_scale_for(m)`` would claim 64²
    provenance for 32² trajectories."""
    return fam.get("scale", dict(_TOY_SCALE))


def _rederive() -> dict:
    """Recompute every summary field of the committed artifact from its
    stored trajectories (no TPU needed)."""
    with open(os.path.join(REPO, "PARITY_TPU.json")) as fh:
        old = json.load(fh)
    out = {}
    for m, f in old["families"].items():
        out[m] = _summarize(f["trajectories"], f["device_kind"])
        if "scale" in f:  # keep measured-at provenance, not current code
            out[m]["scale"] = f["scale"]
    return out


def main(rederive: bool = False) -> int:
    if rederive:
        families = _rederive()
    else:
        wanted = [m for m in os.environ.get(
            "TRAJ_MODELS", ",".join(MODELS)).split(",") if m]
        families = {m: _run_family(m) for m in wanted}
        if set(wanted) != set(MODELS):
            # partial re-measure: carry the other families over from the
            # existing artifact unchanged (re-running one family must
            # not silently drop the rest)
            try:
                with open(os.path.join(REPO, "PARITY_TPU.json")) as fh:
                    for m, fam in json.load(fh).get("families",
                                                    {}).items():
                        families.setdefault(m, fam)
            except (OSError, ValueError):
                pass
    artifact = {
        "generated": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "config": {"per_family_scale": {
            m: _artifact_scale(f) for m, f in families.items()},
                   "note": "synthetic trajectories over all three "
                           "reference downstream families (basic U-Net "
                           "at 256² — the deployment/headline-bench "
                           "resolution; swin at 64², masked SW-MSA at "
                           "R=16; resnet-attention at its tuned toy "
                           "scale); "
                           "the CPU/f32 traces inherit the reference-"
                           "torch-loop chain of evidence via "
                           "tests/test_trajectory_parity.py; the "
                           "swin_unet tpu/bf16 val pass exercises the "
                           "Pallas window-attention dispatch inside the "
                           "full model",
                   "mid_trajectory_deltas_note":
                           "max-over-epochs val-column deltas can reach "
                           "0.1 at these scales WITHOUT indicating a "
                           "wiring bug: train-mode BN cancels any "
                           "channel constant, so pre-BN conv biases get "
                           "mathematically-zero gradients that autodiff "
                           "realises as ~1e-9 float noise; with momentum "
                           "the noise integrates into full-lr steps in a "
                           "backend-dependent direction — measured (tests/"
                           "test_trajectory_parity.py): all weights match "
                           "torch to ~1e-7 after an epoch while exactly "
                           "the pre-BN biases drift 5e-3..1e-2, surfacing "
                           "through eval-mode running stats as val-metric "
                           "chaos.  The f32-vs-f32 cross-backend floor "
                           "recorded per family quantifies it; the "
                           "acceptance proxy (final-epoch val Dice, the "
                           "analog of the reference's "
                           "results/downstream_scores.csv end-of-training "
                           "surface) is the non-chaotic comparison."},
        "families": families,
    }
    # backward-compatible top-level fields = the flagship basic U-Net
    flagship = families.get("unet") or next(iter(families.values()))
    artifact.update({
        "device_kind": flagship["device_kind"],
        "max_abs_epoch_deltas": flagship["max_abs_epoch_deltas"],
        "bf16_val_dice_delta": flagship["bf16_val_dice_delta"],
        "acceptance_proxy": flagship["acceptance_proxy"],
    })
    all_pass = all(f["acceptance_proxy"]["pass"] for f in families.values())
    out = os.path.join(REPO, "PARITY_TPU.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    for name, fam in families.items():
        print(f"{name}: bf16-vs-f32 val Dice delta = "
              f"{fam['bf16_val_dice_delta']:.5f} (threshold 0.005, "
              f"pass={fam['acceptance_proxy']['pass']})", flush=True)
    print(f"wrote {out}", flush=True)
    return 0 if all_pass else 1


if __name__ == "__main__":
    if os.environ.get("TRAJ_CHILD") == "1":
        _run_child()
    else:
        sys.exit(main(rederive="--rederive" in sys.argv[1:]))
