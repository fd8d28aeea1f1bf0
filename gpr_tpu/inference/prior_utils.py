"""Equidistant inverse-transform sampling of priors (reference
include/PriorUtils.h:33-58) — used for brute-force MAP grid search."""

from __future__ import annotations

from typing import List

import numpy as np


def get_samples(density, num_points: int) -> List[float]:
    """Mode + equidistant-icdf samples clipped to mode ± sqrt(variance)
    (reference GetSamples, PriorUtils.h:33-58: the returned list always
    starts with the mode and may hold more or fewer than num_points)."""
    mode = float(density.mode())
    std = float(np.sqrt(float(density.variance())))
    x_start = max(np.finfo(np.float64).eps, mode - std)
    x_end = mode + std

    out = [mode]
    if num_points == 0:
        return out
    for k in range(num_points + 1):
        u = k / num_points
        d = float(density.icdf(u))
        if x_start <= d <= x_end:
            out.append(d)
    return out
