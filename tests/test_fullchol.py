"""Tests for ops/pallas_fullchol — the one-dispatch fused Cholesky and the
fused Gram+Cholesky fit hot path (interpret mode on the CPU backend; the
real-TPU dispatch is exercised by bench.py / the chip session).

Reference hot path being re-designed: include/LAPACKUtils.h:59-73 (dpotrf)
invoked from lib/GaussianProcess.cpp:530-618, plus the Gram build at
lib/GaussianProcess.cpp:384-402 which gram mode fuses away entirely.

NOTE: interpret=True must run on the CPU backend.  On the axon remote-TPU
backend the interpreter's jnp ops execute on-device where DEFAULT-precision
f32 dots round operands to bf16, which silently breaks the bf16x3
emulation (measured: 2e-2 recon error vs 1.6e-4 on CPU).  conftest.py
forces CPU for the whole suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpr_tpu.ops.pallas_fullchol import (
    cholesky_fused,
    gram_cholesky_fused,
    safe_gram_cholesky_fused,
)

F32 = np.float32


def _spd(rng, n):
    B = rng.standard_normal((n, n)).astype(F32)
    return B @ B.T + n * np.eye(n, dtype=F32)


def _ref_gram(X, form, sigma, scale, diag):
    X64 = X.astype(np.float64)
    sq = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
    r = np.sqrt(np.maximum(sq, 0))
    if form == "gaussian":
        K = scale**2 * np.exp(-0.5 * sq / sigma**2)
    elif form == "matern12":
        K = scale**2 * np.exp(-r / sigma)
    elif form == "matern32":
        a = np.sqrt(3.0) * r / sigma
        K = scale**2 * (1 + a) * np.exp(-a)
    elif form == "matern52":
        a = np.sqrt(5.0) * r / sigma
        K = scale**2 * (1 + a + a * a / 3.0) * np.exp(-a)
    elif form == "rq":
        K = scale**2 * (1 + 0.5 * sq / (sigma**2 * 2.0)) ** (-2.0)
    return K + diag * np.eye(len(X))


class TestMatrixMode:
    @pytest.mark.parametrize("n,panel,block,chunk", [
        (128, 128, 64, 2),   # single panel: update machinery must not trace OOB
        (256, 128, 64, 2),   # chunk == nc
        (384, 128, 64, 2),   # odd panel count: tail chunks
        (512, 256, 128, 2),
    ])
    def test_matches_numpy(self, rng, n, panel, block, chunk):
        A = _spd(rng, n)
        L = np.asarray(cholesky_fused(
            jnp.asarray(A), panel=panel, block=block, sw=16, chunk=chunk,
            interpret=True,
        ))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        scale = np.abs(Lr).max()
        assert np.abs(L - Lr).max() / scale < 3e-3  # bf16x3 tier
        assert np.all(np.triu(L, 1) == 0.0)  # exact-zero strict upper

    def test_aug_diag_scheme_matches_numpy(self, rng):
        # the augmented-head diagonal scheme (GPR_FUSED_DIAG=aug): full-tile
        # one-hot-matmul formulation (the original (sw,1)/(1,2sw) masked
        # reductions aborted Mosaic on-chip — BENCH_r03 postmortem)
        n = 256
        A = _spd(rng, n)
        L = np.asarray(cholesky_fused(
            jnp.asarray(A), panel=128, block=64, sw=16, chunk=2,
            interpret=True, diag_scheme="aug",
        ))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        assert np.abs(L - Lr).max() / np.abs(Lr).max() < 3e-3
        assert np.all(np.triu(L, 1) == 0.0)

    @pytest.mark.parametrize("scheme", ["rv", "stat", "stat2", "head"])
    def test_alt_diag_schemes_match_numpy(self, rng, scheme):
        # alternative diagonal-factor schemes (GPR_FUSED_DIAG):
        #   rv    strip factor + recursive-doubling inverse
        #   stat  static-unrolled strips + recursive-doubling inverse
        #   head  (sw, sw)-head-only serial elimination + GEMM strips
        n = 256
        A = _spd(rng, n)
        L = np.asarray(cholesky_fused(
            jnp.asarray(A), panel=128, block=64, sw=16, chunk=2,
            interpret=True, diag_scheme=scheme,
        ))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        assert np.abs(L - Lr).max() / np.abs(Lr).max() < 3e-3
        assert np.all(np.triu(L, 1) == 0.0)

    def test_triu_inv_rec_exact(self, rng):
        import jax

        from gpr_tpu.ops.pallas_fullchol import _triu_inv_rec

        for b in (64, 128):
            B = rng.standard_normal((b, b)).astype(F32)
            U = np.triu(B @ B.T + b * np.eye(b, dtype=F32))
            V = np.asarray(jax.jit(
                lambda u, b=b: _triu_inv_rec(u, b))(jnp.asarray(U)))
            assert np.abs(V @ U - np.eye(b)).max() < 1e-5
            assert np.all(np.tril(V, -1) == 0.0)

    def test_winv_emission_and_panel_solve(self, rng):
        # the kernel's 3rd output: panel-diagonal inverses W_j = inv(L_jj),
        # consumed by cho_solve_panels (pure block-GEMM substitution)
        from gpr_tpu.ops.pallas_fullchol import (
            cho_solve_panels,
            safe_gram_cholesky_fused,
        )

        n, d, q = 512, 6, 3
        X = jnp.asarray(rng.standard_normal((n, d)).astype(F32))
        B = jnp.asarray(rng.standard_normal((n, q)).astype(F32))
        L, W, jit_ = safe_gram_cholesky_fused(
            X, 1.5, 1.2, 1.0, 0.3, form="gaussian", panel=128, block=64,
            sw=16, interpret=True, return_winv=True,
        )
        # W really is inv(L_jj) per panel
        for j in range(W.shape[0]):
            Lj = np.asarray(L)[j * 128:(j + 1) * 128, j * 128:(j + 1) * 128]
            assert np.abs(np.asarray(W)[j] @ Lj - np.eye(128)).max() < 1e-3
        x = np.asarray(cho_solve_panels(L, W, B))
        Lr = np.asarray(L, np.float64)
        ref = np.linalg.solve(Lr @ Lr.T, np.asarray(B, np.float64))
        assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-4

    def test_failed_pivot_poisons_last_diagonal(self, rng):
        A = _spd(rng, 256)
        A[3, 3] = -1e6  # non-positive pivot early in the first panel
        L = np.asarray(cholesky_fused(
            jnp.asarray(A), panel=128, block=64, sw=16, interpret=True,
        ))
        assert not np.isfinite(L[-1, -1])


class TestGramMode:
    @pytest.mark.parametrize("form", ["gaussian", "matern32", "matern52", "rq"])
    def test_recon_matches_f64_gram(self, rng, form):
        n, d = 256, 3
        X = rng.standard_normal((n, d)).astype(F32)
        sigma, scale, diag = 1.3, 2.1, 1.0
        third = 2.0  # rq alpha; ignored by the other forms
        L = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), sigma, scale, third, diag, form=form,
            panel=128, block=64, sw=16, interpret=True,
        ))
        K = _ref_gram(X, form, sigma, scale, diag)
        err = np.abs(L @ L.T - K).max() / np.abs(K).max()
        assert err < 2e-3, f"{form}: recon rel err {err}"

    def test_matern12_cusp_tier(self, rng):
        # matern12's r->0 cusp amplifies sqdist noise; the kernel computes
        # its cross term at HIGHEST — still looser than the smooth forms
        n = 128
        X = rng.standard_normal((n, 3)).astype(F32)
        L = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 1.0, form="matern12",
            panel=128, block=64, sw=16, interpret=True,
        ))
        K = _ref_gram(X, "matern12", 1.3, 2.1, 1.0)
        assert np.abs(L @ L.T - K).max() / np.abs(K).max() < 2e-2

    def test_single_panel(self, rng):
        # regression: full-chunk DMA descriptors used to trace out of
        # bounds when chunk*panel > n
        X = rng.standard_normal((128, 3)).astype(F32)
        L = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 1.0, form="gaussian",
            panel=128, block=64, sw=16, chunk=2, interpret=True,
        ))
        K = _ref_gram(X, "gaussian", 1.3, 2.1, 1.0)
        assert np.abs(L @ L.T - K).max() / np.abs(K).max() < 2e-3

    def test_feature_padding_invariant(self, rng):
        # d is zero-padded to the 128-lane multiple in the wrapper; padding
        # must leave pairwise distances (hence K) unchanged
        n = 128
        X = rng.standard_normal((n, 5)).astype(F32)
        L5 = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 1.0, form="gaussian",
            panel=128, block=64, sw=16, interpret=True,
        ))
        K = _ref_gram(X, "gaussian", 1.3, 2.1, 1.0)
        assert np.abs(L5 @ L5.T - K).max() / np.abs(K).max() < 2e-3


class TestPaddedN:
    """Arbitrary (non-panel-multiple) n rides the fused path via in-kernel
    pad masking: the padded Gram is exactly [[K, 0], [0, scale^2 I]] + diag,
    so the leading (n, n) factor equals chol(K + diag I) and a zero-padded
    RHS solves to an exact-zero tail (VERDICT round-4 item 1: the
    reference's own scales n=2500/n=3773 — tests/GaussianProcessTest.cpp:
    127-154 — previously fell back to the blocked schedule)."""

    @pytest.mark.parametrize("n", [200, 300])
    def test_padded_gram_factor(self, rng, n):
        X = rng.standard_normal((n, 3)).astype(F32)
        sigma, scale, diag = 1.3, 2.1, 0.7
        Lp = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), sigma, scale, 1.0, diag, form="gaussian",
            panel=128, block=64, sw=16, interpret=True,
        ))
        n_pad = -(-n // 128) * 128
        assert Lp.shape == (n_pad, n_pad)
        K = _ref_gram(X, "gaussian", sigma, scale, diag)
        L = Lp[:n, :n]
        assert np.abs(L @ L.T - K).max() / np.abs(K).max() < 2e-3
        # pad rows: exactly zero cross block, sqrt(scale^2 + diag) diagonal
        assert np.all(Lp[n:, :n] == 0.0)
        tail = np.diag(Lp)[n:]
        assert np.abs(tail - np.sqrt(scale**2 + diag)).max() < 1e-5

    def test_padded_fit_solve(self, rng):
        # the full fit()-shaped route: safe wrapper + W emission + panel
        # solve on a padded RHS, sliced back — vs a float64 dense solve
        from gpr_tpu.ops.pallas_fullchol import cho_solve_panels

        n, d, q = 300, 4, 2
        X = rng.standard_normal((n, d)).astype(F32)
        Y = rng.standard_normal((n, q)).astype(F32)
        sigma, scale, noise = 1.5, 1.2, 0.3
        L, W, jit_ = safe_gram_cholesky_fused(
            jnp.asarray(X), sigma, scale, 1.0, noise, form="gaussian",
            panel=128, block=64, sw=16, interpret=True, return_winv=True,
        )
        n_pad = -(-n // 128) * 128
        Yp = jnp.concatenate(
            [jnp.asarray(Y), jnp.zeros((n_pad - n, q), jnp.float32)], axis=0
        )
        alpha = np.asarray(cho_solve_panels(L, W, Yp))
        assert np.all(alpha[n:] == 0.0)  # decoupled pad tail
        K = _ref_gram(X, "gaussian", sigma, scale, noise)
        ref = np.linalg.solve(K, Y.astype(np.float64))
        assert np.abs(alpha[:n] - ref).max() / np.abs(ref).max() < 5e-3
        assert float(jit_) == 0.0

    def test_padded_matches_aligned_prefix(self, rng):
        # bit-level contract: the leading factor of the padded call equals
        # the UNPADDED call on the same points at the aligned prefix size
        X = rng.standard_normal((256, 3)).astype(F32)
        Lfull = np.asarray(gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 0.5, form="gaussian",
            panel=128, block=64, sw=16, interpret=True,
        ))
        Lpad = np.asarray(gram_cholesky_fused(
            jnp.asarray(X[:200]), 1.3, 2.1, 1.0, 0.5, form="gaussian",
            panel=128, block=64, sw=16, interpret=True,
        ))
        # first panel (128 rows) sees identical inputs in both calls
        assert np.array_equal(Lfull[:128, :128], Lpad[:128, :128])


class TestSafeWrapper:
    def test_zero_jitter_on_clean_input(self, rng):
        X = rng.standard_normal((256, 3)).astype(F32)
        L, j = safe_gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 1e-2, form="gaussian",
            panel=128, block=64, interpret=True,
        )
        assert np.isfinite(np.asarray(L)).all()
        assert float(j) == 0.0

    def test_escalates_on_duplicates(self, rng):
        X = rng.standard_normal((384, 3)).astype(F32)
        X[7] = X[3]
        X[100] = X[3]  # exactly singular K at zero noise
        L, j = safe_gram_cholesky_fused(
            jnp.asarray(X), 1.3, 2.1, 1.0, 0.0, form="gaussian",
            panel=128, block=64, interpret=True,
        )
        L = np.asarray(L)
        assert np.isfinite(L).all()
        assert float(j) > 0.0
        # factor must still reconstruct K + jitter to tier accuracy
        K = _ref_gram(X, "gaussian", 1.3, 2.1, float(j))
        assert np.abs(L @ L.T - K).max() / np.abs(K).max() < 2e-3
