"""Plotter regression tests (review findings round 2).

Pins: per-instance deep-copied defaults, generator-safe export_plot,
count-scaled confusion-matrix colormap.
"""
import json

import numpy as np

from medsegpretrainimagenet_tpu.plotting import (ConfMtxPlotter,
                                                 GeneralPlotter,
                                                 export_plot)


def test_defaults_not_shared_between_instances():
    """In-place mutation of one plotter's nested dicts must not leak into
    the class-level DEFAULTS (and thus every later plotter)."""
    p1 = GeneralPlotter({"Ys": [[1, 2, 3]]})
    p1.legend["labels"].append("leaked")
    p1.histogram["Xs"].append([1.0, 2.0])
    p1.baselines["values"].append(0.5)
    p2 = GeneralPlotter({"Ys": [[4, 5, 6]]})
    assert p2.legend["labels"] == []
    assert p2.histogram["Xs"] == []
    assert p2.baselines["values"] == []
    assert GeneralPlotter.DEFAULTS["legend"]["labels"] == []


def test_export_plot_accepts_generator(tmp_path):
    plotter = GeneralPlotter({"Ys": [[1.0, 2.0]], "dirname": str(tmp_path),
                              "fname": "gen"})
    export_plot(plotter, (ext for ext in ("json",)))
    with open(tmp_path / "gen.json") as fh:
        params = json.load(fh)
    assert params["Ys"] == [[1.0, 2.0]]


def test_confmtx_raw_counts_scale_colormap(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    matrix = np.array([[90, 10], [4, 896]], np.int64)
    plotter = ConfMtxPlotter({"matrix": matrix, "normalise": False,
                              "labels": ["neg", "pos"],
                              "dirname": str(tmp_path)})
    fig = plotter.render_matplotlib(plt)
    try:
        im = fig.axes[0].get_images()[0]
        assert im.get_clim() == (0.0, 896.0)
        # cell annotations are integer-formatted for raw counts
        texts = {t.get_text() for t in fig.axes[0].texts}
        assert "896" in texts and "90" in texts
    finally:
        plt.close(fig)

    norm = ConfMtxPlotter({"matrix": matrix, "normalise": True,
                           "dirname": str(tmp_path)})
    fig = norm.render_matplotlib(plt)
    try:
        assert fig.axes[0].get_images()[0].get_clim() == (0.0, 1.0)
    finally:
        plt.close(fig)


def test_histogram_overlay_defaults_isolated_across_runs(tmp_path):
    """A plotter given its own histogram dict must not see earlier
    instances' overlays (shared-DEFAULTS regression, user-visible via
    export)."""
    with_hist = GeneralPlotter({
        "Ys": [[1.0]], "dirname": str(tmp_path), "fname": "h1",
        "histogram": {"labels": ["d"], "Xs": [[0.1, 0.2, 0.3]]}})
    export_plot(with_hist, ["json"])
    plain = GeneralPlotter({"Ys": [[2.0]], "dirname": str(tmp_path),
                            "fname": "h2"})
    export_plot(plain, ["json"])
    with open(tmp_path / "h2.json") as fh:
        params = json.load(fh)
    assert params["histogram"]["Xs"] == []
