"""Inference: post-processing, single-image/batch predictors, export, viz."""
