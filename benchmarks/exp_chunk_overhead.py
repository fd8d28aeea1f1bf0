"""Per-chunk dispatch overhead of the chunked samplers over the tunnel.

BENCHMARKS.md round 2: the chunked HMC path measures 293 samples/s
end-to-end vs the raw 1027 samples/s kernel rate; the residual was
attributed to per-chunk host dispatch latency (~25 ms round trips).  This
experiment pins it down: fixed total transitions T, swept chunk sizes —
the slope of (wall time) vs (number of chunk dispatches) is the per-chunk
overhead, and the intercept is the pure device time.

    python benchmarks/exp_chunk_overhead.py [T] [chain_count] [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    import gpr_tpu
    from gpr_tpu.gp import likelihood as lk
    from gpr_tpu.inference import hmc

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chains = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    Y = jnp.asarray(
        np.sin(np.asarray(X).sum(-1, keepdims=True)).astype(np.float32)
    )

    def logp(z):
        k = gpr_tpu.Gaussian(jnp.exp(z[0]), jnp.exp(z[1]))
        return lk.mll_scalar(k, X, Y, sigma=jnp.exp(z[2]))

    z0 = jnp.asarray(
        rng.standard_normal((chains, 3)).astype(np.float32) * 0.1
    )
    key = jax.random.PRNGKey(0)

    results = {}
    for chunk in (16, 32, 64, 128, 256):
        if chunk > T:
            continue
        cfg = hmc.HMCConfig(
            num_samples=T, num_warmup=0, num_leapfrog=8,
            initial_step_size=0.02, jitter_steps=False,
        )
        # warm: compile + one full run
        r = hmc.sample_hmc_chunked(logp, z0, key, cfg, chunk_size=chunk)
        float(r.samples[0, -1, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = hmc.sample_hmc_chunked(logp, z0, key, cfg, chunk_size=chunk)
            float(r.samples[0, -1, 0])
            best = min(best, time.perf_counter() - t0)
        results[chunk] = best
        print(json.dumps({
            "chunk": chunk, "dispatches": T // chunk,
            "seconds": round(best, 4),
            "samples_per_sec": round(T / best, 1),
        }))

    # overhead per dispatch from the two extreme points
    ks = sorted(results)
    if len(ks) >= 2:
        small, large = ks[0], ks[-1]
        d_disp = T // small - T // large
        ovh = (results[small] - results[large]) / max(d_disp, 1)
        print(json.dumps({
            "per_dispatch_overhead_ms": round(ovh * 1e3, 2),
            "device_floor_s_est": round(
                results[large] - (T // large) * ovh, 4
            ),
        }))


if __name__ == "__main__":
    main()
