"""Anatomy of the chunked sampler's end-to-end wall time (VERDICT r4
item 3: 293 samples/s e2e vs 1027 device-side — halve the host overhead).

Phases timed separately at the published config (8 chains, n=256, L=8):
  warmup-only   num_warmup=W, num_samples=1
  sampling-only num_warmup=0, num_samples=S
  full          num_warmup=W, num_samples=S
Each phase is run twice; the SECOND run's time is reported (programs
cached in-process — the steady-state serving cost).  samples/s follows
the BENCHMARKS.md convention: chains * transitions / seconds.

    python benchmarks/exp_hmc_e2e.py [chains] [n] [chunk]
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

    chains = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    W = int(os.environ.get("GPR_E2E_WARMUP", 512))
    S = int(os.environ.get("GPR_E2E_SAMPLES", 512))

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    Y = jnp.asarray(
        np.sin(np.asarray(X).sum(-1, keepdims=True)).astype(np.float32)
    )

    def logp(z):
        k = gpr_tpu.Gaussian(jnp.exp(z[0]), jnp.exp(z[1]))
        return lk.mll_scalar(k, X, Y, sigma=jnp.exp(z[2]))

    z0 = jnp.asarray(rng.standard_normal((chains, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(0)

    def timed(tag, warmup, samples):
        cfg = hmc.HMCConfig(
            num_warmup=warmup, num_samples=samples, num_leapfrog=8,
            jitter_steps=False,
        )
        r = hmc.sample_hmc_chunked(logp, z0, key, cfg, chunk_size=chunk)
        float(r.samples[0, -1, 0])  # compile + warm all programs
        t0 = time.perf_counter()
        r = hmc.sample_hmc_chunked(logp, z0, key, cfg, chunk_size=chunk)
        float(r.samples[0, -1, 0])
        dt = time.perf_counter() - t0
        trans = warmup + samples
        row = {
            "phase": tag, "warmup": warmup, "samples": samples,
            "seconds": round(dt, 3),
            "samples_per_s": round(chains * trans / dt, 1),
        }
        print(json.dumps(row))
        return dt

    t_w = timed("warmup-only", W, 1)
    t_s = timed("sampling-only", 0, S)
    t_f = timed("full", W, S)
    print(json.dumps({
        "chains": chains, "n": n, "chunk": chunk,
        "warmup_s": round(t_w, 3), "sampling_s": round(t_s, 3),
        "full_s": round(t_f, 3),
        "e2e_samples_per_s": round(chains * (W + S) / t_f, 1),
    }))


if __name__ == "__main__":
    main()
