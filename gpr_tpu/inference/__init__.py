"""Hyperparameter inference: MAP/MLE optimizers, HMC, priors, utilities."""

from . import hmc, nuts, optimize, period, predictive, prior_utils, priors  # noqa: F401
