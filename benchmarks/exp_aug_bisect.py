"""Bisect the aug-scheme Mosaic abort: run each aug-only helper in a
minimal standalone pallas kernel on the real chip, in subprocesses.

    python benchmarks/exp_aug_bisect.py
"""

import os
import subprocess
import sys

HEAD = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gpr_tpu.ops import pallas_fullchol as fc
rng = np.random.default_rng(0)
"""

CASES = {
    # _aug_head_factor alone on a (16, 32) tile
    "aug_head": HEAD + """
sw = 16
H = rng.standard_normal((sw, sw)).astype(np.float32)
H = H @ H.T + sw * np.eye(sw, dtype=np.float32)
eye = np.eye(sw, dtype=np.float32)
T0 = np.concatenate([H, eye], axis=1)

def kern(t_ref, u_ref, r_ref):
    U, R = fc._aug_head_factor(t_ref[:], sw)
    u_ref[:] = U
    r_ref[:] = R

U, R = pl.pallas_call(
    kern,
    out_shape=(jax.ShapeDtypeStruct((sw, sw), jnp.float32),) * 2,
)(jnp.asarray(T0))
L = np.asarray(U).T
err = np.abs(L @ L.T - H).max()
ierr = np.abs(np.asarray(R) @ L - eye).max()
print("aug_head err", err, ierr)
assert err < 1e-3 and ierr < 1e-3
print("CASE_OK")
""",
    # _strip_factor_wi alone on a (256, 256) SPD tile
    "strip_wi": HEAD + """
b, sw = 256, 16
B = rng.standard_normal((b, b)).astype(np.float32)
A = B @ B.T + b * np.eye(b, dtype=np.float32)

def kern(a_ref, u_ref, v_ref):
    U, V = fc._strip_factor_wi(a_ref[:], b, sw)
    u_ref[:] = U
    v_ref[:] = V

U, V = pl.pallas_call(
    kern,
    out_shape=(jax.ShapeDtypeStruct((b, b), jnp.float32),) * 2,
)(jnp.asarray(A))
U = np.asarray(U); V = np.asarray(V)
err = np.abs(U.T @ U - A).max() / np.abs(A).max()
ierr = np.abs(U @ V - np.eye(b)).max()
print("strip_wi err", err, ierr)
assert err < 1e-3 and ierr < 1e-2
print("CASE_OK")
""",
    # _factor_diag_wi aug on a (512, 512) block (the p-level wrapper)
    "diag_wi_aug": HEAD + """
p, b, sw = 512, 256, 16
B = rng.standard_normal((p, p)).astype(np.float32)
A = B @ B.T + p * np.eye(p, dtype=np.float32)

def kern(a_ref, l_ref, w_ref):
    Lb, Wb = fc._factor_diag_wi(a_ref[:], p, b, sw, "aug")
    nb = p // b
    z = jnp.zeros((b, b), jnp.float32)
    for i in range(nb):
        for m in range(nb):
            l_ref[i*b:(i+1)*b, m*b:(m+1)*b] = Lb[i][m] if m <= i else z
            w_ref[i*b:(i+1)*b, m*b:(m+1)*b] = Wb[i][m] if m <= i else z

L, W = pl.pallas_call(
    kern,
    out_shape=(jax.ShapeDtypeStruct((p, p), jnp.float32),) * 2,
)(jnp.asarray(A))
L = np.asarray(L); W = np.asarray(W)
err = np.abs(L @ L.T - A).max() / np.abs(A).max()
ierr = np.abs(W @ L - np.eye(p)).max()
print("diag_wi_aug err", err, ierr)
assert err < 1e-3 and ierr < 1e-2
print("CASE_OK")
""",
}


def main(argv):
    names = argv[1:] or list(CASES)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    fails = 0
    for name in names:
        proc = subprocess.run(
            [sys.executable, "-c", CASES[name]], capture_output=True,
            text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        ok = proc.returncode == 0 and "CASE_OK" in proc.stdout
        print(f"[{'PASS' if ok else 'FAIL'}] {name}")
        if not ok:
            fails += 1
            tail = (proc.stdout + proc.stderr)
            for ln in tail.splitlines():
                if "Check failed" in ln or "err" in ln[:30] or "Error" in ln:
                    print("   ", ln[:200])
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
