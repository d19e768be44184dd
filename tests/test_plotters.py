"""Plotter regression tests (review findings round 2).

Pins: per-instance deep-copied defaults, generator-safe export_plot,
count-scaled confusion-matrix colormap.
"""
import json

import numpy as np
import pytest

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


def _html_record(path):
    """Parse the glyph record fake_bokeh.save embeds in the html body."""
    text = path.read_text()
    start = text.index("<script>") + len("<script>")
    return json.loads(text[start:text.index("</script>")])


def test_scatter_bokeh_html_artifact_and_content(tmp_path):
    """render_bokeh on ScatterPlotter: an .html artifact under the
    default export config, carrying the reference's visual content —
    the 45° line, jittered points with 1-opacity alpha, placed legend
    (reference plotters.py:575-601)."""
    import fake_bokeh
    from medsegpretrainimagenet_tpu.plotting import ScatterPlotter
    fake_bokeh.install()
    try:
        plotter = ScatterPlotter({
            "Xs": [[1.0, 2.0, 3.0], [1.5, 2.5, 3.5]],
            "Ys": [[1.1, 1.9, 3.2], [1.4, 2.6, 3.4]],
            "line45_color": "red", "x_jitter": 0.2, "opacity": 0.3,
            "legend": {"labels": ["a", "b"], "location": "top_left"},
            "dirname": str(tmp_path), "fname": "sc"})
        export_plot(plotter, ["html", "json"])
        rec = _html_record(tmp_path / "sc.html")
    finally:
        fake_bokeh.uninstall()
    lines = [c for c in rec["calls"] if c[0] == "line"]
    scatters = [c for c in rec["calls"] if c[0] == "scatter"]
    assert len(lines) == 1 and lines[0][1]["line_color"] == "red"
    lo_hi = lines[0][1]["args"][0]
    assert lo_hi == [1.0, 3.5]          # 45° line spans ALL series
    assert len(scatters) == 2
    assert scatters[0][1]["alpha"] == pytest.approx(0.7)
    assert scatters[0][1]["legend_label"] == "a"
    # jitter moved at least one x off its grid value, deterministically
    xs = scatters[0][1]["args"][0]
    assert xs != [1.0, 2.0, 3.0]
    assert rec["legend"][0]["location"] == "top_left"
    # single-series x/y callers still work
    fake_bokeh.install()
    try:
        ScatterPlotter({"x": [1, 2], "y": [2, 1],
                        "dirname": str(tmp_path),
                        "fname": "sc1"}).render_bokeh()
    finally:
        fake_bokeh.uninstall()
    assert (tmp_path / "sc1.html").exists()


def test_pca_bokeh_html_artifact_and_content(tmp_path):
    """render_bokeh on PCAPlotter: one glyph per vector group on the
    shared projection, legend located per config (reference
    plotters.py:700-883)."""
    import fake_bokeh
    from medsegpretrainimagenet_tpu.plotting import PCAPlotter
    rng = np.random.default_rng(0)
    groups = [rng.normal(size=(6, 5)).tolist(),
              (rng.normal(size=(4, 5)) + 3).tolist()]
    fake_bokeh.install()
    try:
        plotter = PCAPlotter({
            "vectors": groups, "dirname": str(tmp_path), "fname": "pca",
            "legend": {"labels": ["g1", "g2"],
                       "location": "bottom_left"}})
        export_plot(plotter, ["html"])
        rec = _html_record(tmp_path / "pca.html")
    finally:
        fake_bokeh.uninstall()
    scatters = [c for c in rec["calls"] if c[0] == "scatter"]
    assert len(scatters) == 2
    assert len(scatters[0][1]["args"][0]) == 6     # group sizes kept
    assert len(scatters[1][1]["args"][0]) == 4
    assert scatters[1][1]["legend_label"] == "g2"
    assert scatters[0][1]["alpha"] == pytest.approx(0.8)  # 1 - 0.2
    assert rec["legend"][0]["location"] == "bottom_left"


def test_confmtx_bokeh_html_annotated_heatmap(tmp_path):
    """render_bokeh on ConfMtxPlotter: one rect + one annotation per
    cell, count-formatted for raw matrices, class labels on both axes
    (reference plotters.py:884+)."""
    import fake_bokeh
    from medsegpretrainimagenet_tpu.plotting import ConfMtxPlotter
    matrix = np.array([[90, 10], [4, 896]], np.int64)
    fake_bokeh.install()
    try:
        plotter = ConfMtxPlotter({
            "matrix": matrix, "normalise": False,
            "labels": ["neg", "pos"], "dirname": str(tmp_path),
            "fname": "cm"})
        export_plot(plotter, ["html"])
        rec = _html_record(tmp_path / "cm.html")
    finally:
        fake_bokeh.uninstall()
    rects = [c for c in rec["calls"] if c[0] == "rect"]
    texts = [c for c in rec["calls"] if c[0] == "text"]
    assert len(rects) == 1 and len(rects[0][1]["x"]) == 4
    assert set(texts[0][1]["text"]) == {"90", "10", "4", "896"}
    # the dominant cell is saturated, the near-empty one near white
    fills = rects[0][1]["fill_color"]
    assert fills[3] != fills[1]


def test_bokeh_html_falls_back_to_png_without_bokeh(tmp_path):
    """Without bokeh installed (this image), the default html export
    still yields an artifact: the png fallback."""
    from medsegpretrainimagenet_tpu.plotting import ScatterPlotter
    plotter = ScatterPlotter({"x": [1, 2], "y": [2, 1],
                              "dirname": str(tmp_path), "fname": "fb"})
    export_plot(plotter, ["html"])
    assert (tmp_path / "fb.png").exists()
    assert not (tmp_path / "fb.html").exists()


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
