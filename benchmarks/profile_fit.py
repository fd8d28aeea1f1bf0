"""Per-op trace anatomy of the production fit() (or any variant) on-chip.

Runs one jitted region under ``jax.profiler.trace`` and aggregates device
op durations from the dumped ``trace.json.gz`` — the same protocol behind
BENCHMARKS.md's "per-op trace anatomy" tables.  Ops are bucketed by fusion
name so the output answers "where do the milliseconds live": syrk pallas
calls, gram pallas calls, XLA fusions, triangular-solve custom calls,
dynamic-update-slice, copies.

    BENCH_TARGET=fit   python benchmarks/profile_fit.py   # public gpr_tpu.fit
    BENCH_TARGET=chol  python benchmarks/profile_fit.py   # bare safe_cholesky
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bucket(name: str) -> str:
    n = name.lower()
    if "syrk" in n:
        return "pallas_syrk"
    if "gram" in n:
        return "pallas_gram"
    if "crout" in n or "leaf" in n or "panel" in n:
        return "pallas_other"
    if "triangular" in n:
        return "triangular_solve"
    if "cholesky" in n:
        return "leaf_cholesky"
    if "dynamic-update-slice" in n or "dynamic_update_slice" in n:
        return "dus"
    if "copy" in n:
        return "copy"
    if "fusion" in n:
        return "fusion"
    if "convolution" in n or "dot" in n:
        return "dot"
    return "other"


def main():
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    import jax.numpy as jnp
    import numpy as np

    target = os.environ.get("BENCH_TARGET", "fit")
    n = int(os.environ.get("BENCH_N", 16384))
    d, q = 128, 8
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    import gpr_tpu
    from gpr_tpu.gp import exact
    from gpr_tpu.ops import linalg

    on_accel = jax.default_backend() not in ("cpu",)

    if target == "fit":
        X = jnp.asarray(rng.standard_normal((n, d)), dtype)
        Y = jnp.asarray(rng.standard_normal((n, q)), dtype)
        kernel = gpr_tpu.Gaussian(jnp.asarray(8.0, dtype), jnp.asarray(1.0, dtype))
        sigma = jnp.asarray(0.1, dtype)

        @jax.jit
        def step(X, Y, sigma):
            gp = exact.fit(kernel, X, Y, sigma=sigma, use_pallas_gram=on_accel)
            return jnp.sum(gp.L[-1]) + jnp.sum(gp.alpha[-1])

        args = (X, Y, sigma)
    elif target == "fleet":
        B = int(os.environ.get("BENCH_B", 128))
        nf = int(os.environ.get("BENCH_FLEET_N", 512))
        from gpr_tpu.gp import batched as bat

        X = jnp.asarray(rng.standard_normal((B, nf, 8)), dtype)
        Y = jnp.asarray(rng.standard_normal((B, nf, 4)), dtype)
        kernel = gpr_tpu.Gaussian(jnp.float32(2.0), jnp.float32(1.0))

        @jax.jit
        def step(X, Y):
            fleet = bat.fit_batched(kernel, X, Y, sigma=0.1)
            return jnp.sum(fleet.alpha[:, -1])

        args = (X, Y)
    else:  # bare safe_cholesky on a prebuilt SPD matrix
        B = rng.standard_normal((n, 256)).astype(np.float32)
        A = jnp.asarray(B) @ jnp.asarray(B.T) * (1.0 / 256) + 4.0 * jnp.eye(n, dtype=dtype)

        @jax.jit
        def step(A):
            L, _ = linalg.safe_cholesky(A)
            return jnp.sum(L[-1])

        args = (A,)

    t0 = time.perf_counter()
    float(step(*args))  # compile + warm
    print(f"compile+warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    log_dir = os.environ.get("BENCH_TRACE_DIR") or tempfile.mkdtemp(prefix="gpr_trace_")
    reps = int(os.environ.get("BENCH_TRACE_REPS", 4))
    with jax.profiler.trace(log_dir):
        for _ in range(reps):
            float(step(*args))

    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print(json.dumps({"error": "no trace produced", "log_dir": log_dir}))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device lanes: TensorCore pids. Aggregate complete events (ph == "X").
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        p for p, name in pid_names.items()
        if re.search(r"tpu|tensorcore|device|/device", name, re.I)
        and not re.search(r"host|python", name, re.I)
    }
    totals = collections.defaultdict(float)
    names = collections.defaultdict(float)
    span_min, span_max = float("inf"), 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        name = ev.get("name", "")
        totals[_bucket(name)] += dur
        names[name] += dur
        ts = float(ev.get("ts", 0.0))
        span_min = min(span_min, ts)
        span_max = max(span_max, ts + dur)

    per_it = {k: round(v / reps / 1e3, 3) for k, v in sorted(totals.items(), key=lambda kv: -kv[1])}
    top = sorted(names.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({
        "target": target, "n": n, "reps": reps,
        "device_pids": sorted(pid_names.get(p, str(p)) for p in device_pids),
        "per_iteration_ms_by_bucket": per_it,
        "busy_ms_per_it": round(sum(totals.values()) / reps / 1e3, 3),
        "wall_span_ms_per_it": round((span_max - span_min) / reps / 1e3, 3)
        if span_max > span_min else None,
        "log_dir": log_dir,
    }, indent=1))
    print("\ntop ops (total us across reps):", file=sys.stderr)
    for name, dur in top:
        print(f"  {dur:12.0f}  {name[:110]}", file=sys.stderr)


if __name__ == "__main__":
    main()
