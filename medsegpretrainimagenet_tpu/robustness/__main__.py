"""Transferability sweep CLI: ``python -m medsegpretrainimagenet_tpu.robustness cfg.yaml``.

The reference ships the swept output (``results/robustness_scores.csv``,
25 200 rows) but no driver; this is the missing driver.  The YAML names
probe datasets (built through the registry, probe images taken from the
train split), encoders (a model config + optional checkpoint weights +
metadata), and the sweep axes:

```yaml
data:
  COVIDQUDataset:
    segmentation.datasets.COVIDQUDataset:
      lung_or_infection: inf
      image_sizes: 224
probe_images: 64
encoders:
  - name: unet_encoder
    pretraining_scheme: simple
    pretraining_length: 20
    weights: ../encoder_weights/..._epoch_20.pt   # optional
    model:
      segmentation.models.UNet_encoder:
        in_channel_size: 3
metrics: [cosine_distance, l2, inv_pearson]
margins: [0.0, 0.5]
levels: [1, 2, 3, 4]
pooled: [false, true]
output: robustness_scores.csv
seed: 0
```
"""
from __future__ import annotations

import os
import sys

# MST_PLATFORM=cpu forces the platform programmatically (same contract
# as src/experiment.py — env vars alone cannot override a sitecustomize
# that pins a plugin backend)
if os.environ.get("MST_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MST_PLATFORM"])

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    import yaml

    from ..config import ConfigDict, registry
    from ..models import Model
    from ..models.wrapper import _graft
    from ..data import Dataset
    from ..train.checkpoint import load_encoder_variables
    from ..train.torch_mapping import (looks_like_torch_encoder,
                                       translate_reference_encoder)
    from ..predict import _model_in_channels
    from .sweep import adapt_channels, run_sweep, write_scores_csv

    with open(argv[0]) as fh:
        cfg = ConfigDict(yaml.full_load(fh))

    seed = cfg.get("seed", 0)
    n_probe = cfg.get("probe_images", 64)

    if n_probe % 2:
        print(f"warning: odd probe_images ({n_probe}) — the reversed+"
              f"rolled negative pairing self-matches one index "
              f"(reference eval.py:20-24 quirk); use an even count")

    datasets = {}
    for alias in cfg["data"].keys():
        ds = registry.build(cfg[f"data/{alias}"].trim(),
                            wrapper=Dataset, seed=seed)
        imgs = np.asarray(ds.train["x"][:n_probe], np.float32)
        if imgs.max() > 1.5:
            # uint8_transfer datasets ship 0-255; the color jitter and
            # the encoders expect [0, 1]
            imgs = imgs / 255.0
        # keep the native channel count: 1->N repeat happens per encoder
        # in run_sweep (a 1-channel encoder must NOT probe 3-channel
        # images — its checkpoint's stem kernel would fail to graft and
        # the sweep would score random weights)
        name = alias.split(".")[-1]
        if name in datasets:
            # two aliases sharing a final component must not silently
            # overwrite each other in the CSV's `dataset` column
            print(f"warning: dataset short name {name!r} already used; "
                  f"keying {alias!r} by its full alias")
            name = alias
        datasets[name] = imgs

    encoders = []
    for enc_cfg in cfg.elements_of("encoders"):
        model = registry.build(enc_cfg["model"].trim(), wrapper=Model)
        # init (and later probe) with the encoder's OWN channel count: a
        # 1-channel encoder init'd on 3-channel probes gets a (k,k,3,C)
        # stem kernel that its (k,k,1,C) checkpoint cannot graft into
        want_channels = _model_in_channels(enc_cfg)
        if want_channels is None:
            want_channels = getattr(model.module, "in_channel_size", None)
        sample = np.asarray(adapt_channels(
            datasets[next(iter(datasets))][:1], want_channels))
        variables = model.init(jax.random.key(seed), {"x": sample})
        weights = enc_cfg.get("weights")
        if weights:
            loaded, stats = load_encoder_variables(weights)
            if looks_like_torch_encoder(loaded):
                loaded, leftover = translate_reference_encoder(loaded)
                if leftover:
                    print(f"warning: unmapped torch keys in {weights}: "
                          f"{leftover[:6]}")
                stats = loaded["batch_stats"]
                loaded = loaded["params"]

            def report(missing, unexpected, _weights=weights):
                # a checkpoint that does not line up with the encoder must
                # not load as a silent no-op — the sweep would emit scores
                # from random weights
                if missing:
                    print(f"warning: {len(missing)} params of the encoder "
                          f"not in {_weights} (left random), e.g. "
                          f"{['/'.join(p) for p in missing[:4]]}")
                if unexpected:
                    print(f"warning: {len(unexpected)} keys of {_weights} "
                          f"unused, e.g. "
                          f"{['/'.join(p) for p in unexpected[:4]]}")

            variables = dict(variables)
            variables["params"] = _graft(variables["params"], loaded,
                                         report)
            if stats and variables.get("batch_stats"):
                # BN running stats matter: the probe forward runs in eval
                # mode and normalizes with them
                variables["batch_stats"] = _graft(variables["batch_stats"],
                                                  stats, report)
        encoders.append({
            "module": model.module, "variables": variables,
            "name": enc_cfg.get("name", "encoder"),
            "pretraining_scheme": enc_cfg.get("pretraining_scheme", "none"),
            "pretraining_length": enc_cfg.get("pretraining_length", 0),
            "in_channels": want_channels,
        })

    rows = run_sweep(
        encoders, datasets,
        metrics=cfg.get_str_tuple("metrics") or ("cosine_distance", "l2",
                                                 "inv_pearson"),
        margins=cfg.get_tuple("margins", (0.0, 0.5)),
        levels=cfg.get_tuple("levels", (1, 2, 3, 4)),
        pooled=tuple(bool(p) for p in cfg.get_tuple("pooled",
                                                    (False, True))),
        batch_size=cfg.get("batch_size", 32), seed=seed)
    out = cfg.get("output", "robustness_scores.csv")
    write_scores_csv(out, rows)
    print(f"wrote {len(rows)} rows to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
