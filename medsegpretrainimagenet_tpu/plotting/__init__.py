from .plotters import (ConfMtxPlotter, GeneralPlotter,  # noqa: F401
                       PCAPlotter, ScatterPlotter, export_plot)

__all__ = ["GeneralPlotter", "PCAPlotter", "ScatterPlotter", "ConfMtxPlotter",
           "export_plot"]
