"""Transferability ("robustness") scoring of pretrained encoders.

Capability parity with ``/root/reference/src/robustness``: margin scores
over per-level encoder activations of two differently color-jittered views
(``eval.py:7-70``), with cosine / L2 / inverse-Pearson distances
(``distance.py:3-10``), plus a sweep driver reproducing the
``results/robustness_scores.csv`` output space.
"""
from .distances import cosine_distance, inv_pearson_corr, l2_loss
from .eval import Robustness, color_jitter, eval_encoder, predict_w_model
from .sweep import run_sweep, write_scores_csv

__all__ = ["Robustness", "eval_encoder", "predict_w_model", "color_jitter",
           "cosine_distance", "l2_loss", "inv_pearson_corr", "run_sweep",
           "write_scores_csv"]
