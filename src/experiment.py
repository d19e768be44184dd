#!/usr/bin/env python
"""Reference-compatible entry point: ``python src/experiment.py config.yaml``.

Thin shim over ``medsegpretrainimagenet_tpu.cli`` so the YAML configs shipped
with the reference framework drive this TPU-native stack unchanged
(SURVEY.md §5.6: the 15 shipped configs are the acceptance surface).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# This machine's sitecustomize pins JAX_PLATFORMS to the axon TPU tunnel
# before user code runs, so the usual env var is silently ignored.
# MST_PLATFORM=cpu forces the platform programmatically (the only
# override that works after backend plugins register).
if os.environ.get("MST_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MST_PLATFORM"])

from medsegpretrainimagenet_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
