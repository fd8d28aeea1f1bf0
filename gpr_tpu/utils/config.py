"""Global dtype / precision policy for gpr_tpu.

The reference library (agiger/GPR) is templated over float/double and mixes
long-double for determinants (reference: include/Likelihood.h:48,111). On TPU
we instead run a two-tier policy:

  * ``parity``  — float64 everywhere (requires ``jax_enable_x64``); used by the
    golden tests that reproduce the reference's numerical results.
  * ``fast``    — float32 master arrays with bfloat16 MXU matmuls where safe;
    the production TPU path.

The policy only controls *defaults*; every public function also accepts
explicit ``dtype=`` overrides.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Policy:
    name: str
    default_dtype: jnp.dtype
    # dtype accumulated in on the MXU for matmuls
    accum_dtype: jnp.dtype


_FAST = Policy(name="fast", default_dtype=jnp.float32, accum_dtype=jnp.float32)
_PARITY = Policy(name="parity", default_dtype=jnp.float64, accum_dtype=jnp.float64)

_active = _FAST


def enable_x64() -> None:
    """Turn on float64 support process-wide (needed for the parity policy)."""
    jax.config.update("jax_enable_x64", True)


def set_policy(name: str) -> Policy:
    global _active
    if name == "fast":
        _active = _FAST
    elif name == "parity":
        enable_x64()
        _active = _PARITY
    else:
        raise ValueError(f"unknown policy {name!r}; expected 'fast' or 'parity'")
    return _active


def policy() -> Policy:
    return _active


def default_dtype() -> jnp.dtype:
    return _active.default_dtype


@contextlib.contextmanager
def policy_scope(name: str):
    global _active
    prev = _active
    try:
        set_policy(name)
        yield _active
    finally:
        _active = prev


# ---------------------------------------------------------------------------
# matmul precision policy
# ---------------------------------------------------------------------------
# On TPU v5e, f32 matmuls at jax's DEFAULT precision round operands to
# bf16 — measured 2.4e-3 relative error at m=4096, enough to break
# Gram-matrix conditioning and posterior parity.  Tiers measured on v5e:
#   default  2.4e-3 rel err  (1 bf16 pass,  fastest)
#   high     1.3e-5 rel err  (bf16x3 ~ f32-grade, ~2x default cost)
#   highest  5.8e-7 rel err  (bf16x6 = full f32, ~3x default cost)
# The numerics core defaults to "high" — f32-grade accuracy at ~2/3 the
# cost of full f32; switch to "highest" for bit-level parity studies or
# "default" for throughput experiments.

_matmul_precision = "high"


def set_matmul_precision(p: str) -> None:
    global _matmul_precision
    if p not in ("default", "high", "highest"):
        raise ValueError(f"unknown matmul precision {p!r}")
    _matmul_precision = p


def matmul_precision() -> str:
    return _matmul_precision
