"""Structured bokeh stand-in for plotter html-export tests.

bokeh is genuinely absent from this image (conftest.REFERENCE_MOCK_ROOTS),
but the plotters' ``render_bokeh`` methods must be testable beyond "it
didn't raise": this shim records every glyph call on the figure and
writes a real .html artifact on ``save`` whose body is the JSON glyph
record, so tests can assert both the artifact and its visual content
(45° line drawn, alpha applied, one rect per confusion cell, ...).

Install with :func:`install` (returns the module), remove with
:func:`uninstall`; both manipulate ``sys.modules`` only — nothing is
written to site-packages.
"""
import json
import sys
import types


class _Recorder:
    """Records attribute-style sub-objects (legend/axis entries)."""

    def __init__(self, **attrs):
        self.__dict__.update(attrs)

    def __setattr__(self, key, value):
        self.__dict__[key] = value


class _AxisList(list):
    """bokeh's fig.xaxis behaves like a list AND proxies attribute
    assignment to every element."""

    def __setattr__(self, key, value):
        for item in self:
            setattr(item, key, value)


class FakeFigure:
    def __init__(self, **kwargs):
        self.init_kwargs = kwargs
        self.calls = []          # (glyph_name, kwargs) in draw order
        self.legend = []
        self.xaxis = _AxisList([_Recorder()])
        self.yaxis = _AxisList([_Recorder()])
        self.axis = _AxisList(list(self.xaxis) + list(self.yaxis))
        self.grid = _AxisList([_Recorder()])
        self.title = _Recorder(text=kwargs.get("title", ""))
        self.layouts = []

    def _glyph(self, name, args, kwargs):
        if kwargs.get("legend_label") and not self.legend:
            self.legend.append(_Recorder(location="top_right"))
        self.calls.append((name, {"args": args, **kwargs}))

    def __getattr__(self, name):
        # any glyph method (line, scatter, circle, quad, rect, text, ...)
        if name.startswith("_"):
            raise AttributeError(name)

        def method(*args, **kwargs):
            self._glyph(name, list(args), kwargs)
        return method

    def add_layout(self, obj, *args):
        self.layouts.append(obj)

    def record(self):
        def default(o):
            if isinstance(o, _Recorder):
                return {k: v for k, v in o.__dict__.items()}
            return str(o)
        return json.dumps(
            {"init": self.init_kwargs, "calls": self.calls,
             "legend": self.legend, "layouts": self.layouts},
            default=default)


_STATE = {"path": None}


def _output_file(path, **kwargs):
    _STATE["path"] = path


def _save(fig, **kwargs):
    with open(_STATE["path"], "w") as fh:
        fh.write("<html><body><script>"
                 + fig.record() + "</script></body></html>")
    return _STATE["path"]


def _build():
    root = types.ModuleType("bokeh")
    io = types.ModuleType("bokeh.io")
    plotting = types.ModuleType("bokeh.plotting")
    models = types.ModuleType("bokeh.models")
    io.output_file = _output_file
    io.save = _save
    plotting.figure = FakeFigure

    class Span(_Recorder):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
    models.Span = Span
    root.io, root.plotting, root.models = io, plotting, models
    root.__version__ = "0.fake"
    return {"bokeh": root, "bokeh.io": io, "bokeh.plotting": plotting,
            "bokeh.models": models}


def install():
    mods = _build()
    sys.modules.update(mods)
    return mods["bokeh"]


def uninstall():
    for name in list(sys.modules):
        if name == "bokeh" or name.startswith("bokeh."):
            del sys.modules[name]
