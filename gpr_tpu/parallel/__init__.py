"""Multi-chip / multi-host scale-out: sharded HMC chains and distributed
Gram/Cholesky (the reference has no distributed layer — SURVEY.md §2.6)."""

from . import sharded_gram, sharded_hmc  # noqa: F401
from .sharded_gram import (  # noqa: F401
    cho_solve_sharded,
    cholesky_sharded,
    default_mesh,
    fit_sharded,
    sharded_gram as gram_sharded,
)
from .sharded_hmc import (  # noqa: F401
    sample_hmc_sharded,
    sample_hmc_sharded_chunked,
    sample_nuts_sharded_chunked,
)
