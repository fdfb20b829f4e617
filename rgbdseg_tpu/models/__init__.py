"""Model components (Flax linen modules, NHWC activations)."""
