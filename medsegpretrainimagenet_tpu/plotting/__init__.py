from .plotters import (ConfMtxPlotter, GeneralPlotter,  # noqa: F401
                       ScatterPlotter, export_plot)

__all__ = ["GeneralPlotter", "ScatterPlotter", "ConfMtxPlotter",
           "export_plot"]
