"""Kernel algebra: base kernels, combinators, DSL, composite builders."""

from . import dsl, kernels, utils  # noqa: F401
