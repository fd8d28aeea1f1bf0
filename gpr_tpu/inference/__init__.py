"""Hyperparameter inference: MAP/MLE optimizers, HMC, priors, utilities."""

from . import hmc, optimize, period, prior_utils, priors  # noqa: F401
