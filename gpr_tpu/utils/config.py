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
