"""Feature pipeline: PCA, AR(p), image I/O, and the data parser."""

from . import autoregression, dataparser, imageio, pca  # noqa: F401
