"""Micro-bench of the fused factorizer's in-kernel pieces (on-chip).

Times standalone pallas kernels that run REPS sequential copies of one
piece on a (p, p) VMEM tile, so the per-call cost is the slope:

  diag_wi   _factor_diag_wi (strip factor + inverse + block dots)
  strip     _strip_factor only
  inv       _inv_upper only
  gemm3     one bf16x3 (p, p) @ (p, p)^T triple-dot (the update iter's MXU work)

    python benchmarks/exp_fused_parts.py [p] [reps]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    from gpr_tpu.ops.pallas_fullchol import (
        _bf16_split, _d16, _factor_diag_wi, _mirror_lower,
    )
    from gpr_tpu.ops.pallas_panel import _strip_factor, _inv_upper

    p = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = int(os.environ.get("GPR_PARTS_B", 256))
    sw = int(os.environ.get("GPR_PARTS_SW", 8))

    def make(body, nout=1):
        def kern(a_ref, o_ref):
            x = a_ref[:]
            for _ in range(reps):
                x = body(x)
            o_ref[:] = x

        @jax.jit
        def run(a):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((p, p), a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * (1 << 20)
                ),
                interpret=jax.default_backend() != "tpu",
            )(a)

        return run

    def diag_body(x):
        L, W = _factor_diag_wi(x, p, b, sw)
        out = x
        for i in range(p // b):
            for m in range(i + 1):
                blk = (L[i][m] + W[i][m]) * 1e-30
                out = out + jnp.pad(
                    blk, ((i * b, p - (i + 1) * b), (m * b, p - (m + 1) * b))
                )
        return out

    def strip_body(x):
        xs = [
            _strip_factor(_mirror_lower(x[i * b:(i + 1) * b, i * b:(i + 1) * b], b), b, sw)
            for i in range(p // b)
        ]
        out = x
        for i, u in enumerate(xs):
            out = out + 1e-30 * jnp.pad(u, ((i * b, p - (i + 1) * b), (i * b, p - (i + 1) * b)))
        return out

    def inv_body(x):
        xs = [
            _inv_upper(x[i * b:(i + 1) * b, i * b:(i + 1) * b], b, sw)
            for i in range(p // b)
        ]
        out = x
        for i, u in enumerate(xs):
            out = out + 1e-30 * jnp.pad(u, ((i * b, p - (i + 1) * b), (i * b, p - (i + 1) * b)))
        return out

    def gemm3_body(x):
        hi, lo = _bf16_split(x)
        acc = _d16(hi, hi)
        acc += _d16(hi, lo)
        acc += _d16(lo, hi)
        return x + acc * 1e-30

    bodies = {
        "diag_wi": diag_body,
        "strip": strip_body,
        "inv": inv_body,
        "gemm3": gemm3_body,
    }

    rng = np.random.default_rng(0)
    X = rng.standard_normal((p, 64)).astype(np.float32)
    A = jnp.asarray(X @ X.T + p * np.eye(p, dtype=np.float32))

    out = {}
    for name, body in bodies.items():
        f = make(body)
        float(jnp.sum(f(A)))  # compile+run
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(f(A)))
            best = min(best, time.perf_counter() - t0)
        # subtract one-fetch overhead using an empty-ish kernel? report raw/rep
        out[name] = round(best / reps * 1e6, 1)
        print(json.dumps({"piece": name, "us_per_rep_incl_fetch": out[name]}))
    print(json.dumps({"p": p, "reps": reps, "us": out}))


if __name__ == "__main__":
    main()
