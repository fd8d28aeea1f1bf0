"""Hyperparameter inference: MAP/MLE optimizers, HMC/NUTS samplers,
mean-field ADVI, priors, utilities."""

from . import (  # noqa: F401
    advi,
    hmc,
    nuts,
    optimize,
    period,
    predictive,
    prior_utils,
    priors,
)
