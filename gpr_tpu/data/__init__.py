"""Dataset preparation utilities (the reference's scripts/data/ layer)."""

from . import prep  # noqa: F401
