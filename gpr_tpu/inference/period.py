"""FFT-based period-length estimation for periodic-kernel initialization.

Re-design of the reference's ``GetLocalPeriodLength``
(reference include/LikelihoodUtils.h:31-75): the periodic kernel's
likelihood surface is multimodal in the period hyperparameter, so the
reference seeds it from the dominant FFT frequency of the signal.  Kept
because HMC/NUTS warmup benefits from the same initialization (SURVEY.md §7
"hard parts").

Semantics preserved: single-sided amplitude spectrum 2|F_k|/N, the first
``omit`` bins ignored, period = N / argmax, and "sinus-likeness" =
amp_integral/(amp_integral - amp_max) - 1 (large when one frequency
dominates)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_local_period_length(
    vec, omit: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(period_length, dominant_amplitude, sinus_likeness) of a 1-D signal.

    jittable (static signal length); matches the reference formulas at
    LikelihoodUtils.h:44-74."""
    vec = jnp.ravel(jnp.asarray(vec))
    n = vec.shape[0]
    if n < 4 + omit:
        raise ValueError(
            "GetLocalPeriodLength: longer signal required. "
            "Check if a column vector is provided!"
        )
    F = jnp.fft.rfft(vec)
    half = n // 2
    amps = 2.0 * jnp.abs(F[:half]) / n
    # mask out the omitted leading bins (DC + slow drift)
    idx = jnp.arange(half)
    masked = jnp.where(idx >= omit, amps, -jnp.inf)
    max_index = jnp.argmax(masked)
    amp_max = masked[max_index]
    amp_integral = jnp.sum(jnp.where(idx >= omit, amps, 0.0))

    period_length = n / max_index.astype(vec.dtype)
    denom = amp_integral - amp_max
    tiny = jnp.finfo(vec.dtype).tiny
    sinus_likeness = jnp.where(
        denom < tiny,
        jnp.finfo(vec.dtype).max,
        amp_integral / jnp.maximum(denom, tiny) - 1.0,
    )
    return period_length, amp_max, sinus_likeness


def periodic_b_from_period(period_length, dtype=None) -> jax.Array:
    """Convert a period length (in sample units) to the Periodic kernel's
    ``b`` parameter: b = pi / period (reference PeriodicKernel uses
    sin(b * delta), Kernel.h:902-1036)."""
    import math

    return jnp.asarray(math.pi, dtype) / jnp.asarray(period_length, dtype)
