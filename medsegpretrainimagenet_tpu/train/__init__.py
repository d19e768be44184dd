"""Training loop, steps, state, and checkpointing."""
