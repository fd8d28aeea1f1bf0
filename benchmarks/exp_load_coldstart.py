"""Serve cold-start: model load at the breathing scale (n=3773) with the
round-5 CoreMatrix-consuming ``load`` (VERDICT r4 item 8).

The round-4 ``load`` re-factorized K at every model load — O(n^3) on the
serve cold path (plus a remote compile the first time).  ``load`` now
consumes the stored CoreMatrix directly; this measures both halves:

  load_wall      gp = load(prefix)  (file parse + device transfer; NO factorization)
  first_predict  one predict + credible_interval through the loaded model
                 (the core-GEMM covariance path), compile excluded/included

    python benchmarks/exp_load_coldstart.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
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
    from gpr_tpu.gp import exact

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3773
    d, q = 5, 3
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
    gp = exact.fit(
        gpr_tpu.Gaussian(2.0, 1.0), X, Y, sigma=0.3,
        use_pallas_gram=jax.default_backend() == "tpu",
    )
    tmp = tempfile.mkdtemp()
    prefix = os.path.join(tmp, "model")
    t0 = time.perf_counter()
    gp.save(prefix)
    t_save = time.perf_counter() - t0

    t0 = time.perf_counter()
    gp2 = exact.load(prefix)
    t_load = time.perf_counter() - t0
    assert gp2.L is None and gp2.core is not None

    x = np.asarray(X[0])
    t0 = time.perf_counter()
    mean = np.asarray(gp2.predict(x))
    ci = float(gp2.credible_interval(x))
    t_first = time.perf_counter() - t0  # includes compile of the core path
    t0 = time.perf_counter()
    mean = np.asarray(gp2.predict(x))
    ci = float(gp2.credible_interval(x))
    t_warm = time.perf_counter() - t0

    print(json.dumps({
        "n": n,
        "save_s": round(t_save, 3),
        "load_s": round(t_load, 3),
        "first_predict_ci_s": round(t_first, 3),
        "warm_predict_ci_s": round(t_warm, 4),
        "note": "load consumes the stored CoreMatrix; no O(n^3) refit",
    }))


if __name__ == "__main__":
    main()
