"""Numerics backend: PSD-safe linalg, blocked Cholesky, Pallas kernels."""

from . import blocked, linalg, pallas_gram  # noqa: F401
