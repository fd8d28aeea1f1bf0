"""Exact multivariate GP regression, TPU-native.

Functional re-design of the reference ``gpr::GaussianProcess``
(reference include/GaussianProcess.h:33-328, lib/GaussianProcess.cpp).  The
reference mutates a stateful object (AddSample -> Initialize -> Predict) and
*explicitly inverts* the Gram matrix (lib/GaussianProcess.cpp:530-618).  Here
training is one pure jittable function producing an immutable ``GP`` pytree,
and all solves go through a Cholesky factor — numerically tighter and MXU
friendly.  The explicit inverse (CoreMatrix) exists only as a save/load
artifact for byte-level compatibility with the reference model format.

Mapping to the reference API:

    reference                                   here
    ---------------------------------------     -------------------------
    AddSample + Initialize                      fit(kernel, X, Y, sigma)
    Predict(x)                                  gp.predict(x)
    PredictDerivative(x, D)                     gp.predict_derivative(x)
    operator()(x, y)   (posterior cov)          gp.posterior_cov(x, y)
    GetCredibleInterval(x)                      gp.credible_interval(x)
    Save(prefix) / Load(prefix)                 gp.save(prefix) / load(prefix)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import tree_util

from ..kernels import kernels as kermod
from ..kernels.dsl import kernel_to_string, parse_kernel
from ..ops import linalg
from ..utils.config import matmul_precision
from ..utils import matrixio


@dataclasses.dataclass(frozen=True)
class GP:
    """Trained exact GP (immutable pytree).

    Fields:
      kernel  kernel pytree
      X       (n, d) training inputs   (reference m_SampleVectors, columns)
      Y       (n, q) training labels   (reference m_LabelVectors, columns)
      sigma   observation noise std    (reference m_Sigma)
      alpha   (n, q) regression vectors = (K + sigma^2 I)^-1 Y
              (reference m_RegressionVectors)
      L       (n, n) Cholesky factor of K + sigma^2 I; None in
              efficient-storage mode (reference m_EfficientStorage drops the
              CoreMatrix, GaussianProcess.h:150-156)
      core    (n, n) explicit inverse (K + sigma^2 I)^-1 — the reference's
              m_CoreMatrix.  Populated by :func:`load` from the stored
              artifact so a loaded model predicts WITHOUT the O(n^3)
              refactorization (the reference consumes the stored CoreMatrix
              directly, lib/GaussianProcess.cpp:183-268); covariance-path
              solves then run as one GEMM against it.  ``fit`` leaves it
              None (Cholesky solves are tighter and the inverse is never
              needed in-process).
    """

    kernel: Any
    X: jax.Array
    Y: jax.Array
    sigma: Any
    alpha: jax.Array
    L: Optional[jax.Array]
    core: Optional[jax.Array] = None

    # --- prediction --------------------------------------------------------
    def predict(self, Xs) -> jax.Array:
        """Posterior mean.  Accepts one point (d,) -> (q,), or a batch
        (m, d) -> (m, q).  (reference lib/GaussianProcess.cpp:53-61)"""
        Xs_arr = jnp.asarray(Xs)
        Xs2 = self._check_input(Xs_arr)
        single = Xs_arr.ndim <= 1 and Xs2.shape[0] == 1
        Ks = kermod.gram(self.kernel, Xs2, self.X)  # (m, n)
        mean = jnp.matmul(Ks, self.alpha, precision=matmul_precision())
        return mean[0] if single else mean

    def predict_derivative(self, x):
        """(mean, D) where D[i, j] = d mean_j / d x_i — exact Jacobian of the
        posterior mean via forward-mode autodiff.  Generalizes the
        reference's RBF-specific formula (lib/GaussianProcess.cpp:63-81,
        which hardcodes D.col(i) = -X^T (Kx ⊙ alpha_i), valid for unit-sigma
        Gaussian kernels only — cf. tests/GaussianProcessTest.cpp:238-279)."""
        x = jnp.atleast_1d(jnp.asarray(x))
        mean = self.predict(x)
        J = jax.jacfwd(lambda v: self.predict(v))(x)  # (q, d)
        return mean, J.T  # (d, q) like the reference's D

    def posterior_cov(self, x, y) -> jax.Array:
        """gp(x, y) = k(x,y) - Kx^T (K + sigma^2 I)^-1 Ky
        (reference lib/GaussianProcess.cpp:83-99)."""
        Kx = kermod.kvec(self.kernel, self.X, x)
        Ky = kermod.kvec(self.kernel, self.X, y)
        return self.kernel(
            jnp.atleast_1d(x), jnp.atleast_1d(y)
        ) - jnp.matmul(Kx, self._core_solve(Ky[:, None])[:, 0],
                       precision=matmul_precision())

    def posterior_var(self, Xs) -> jax.Array:
        """Batched diagonal posterior variance at points Xs (m, d) -> (m,)."""
        Xs2 = self._check_input(jnp.asarray(Xs))
        Ks = kermod.gram(self.kernel, Xs2, self.X)  # (m, n)
        kss = jax.vmap(lambda v: self.kernel(v, v))(Xs2)
        solved = self._core_solve(Ks.T)  # (n, m)
        return kss - jnp.sum(Ks * solved.T, axis=-1)

    def credible_interval(self, x) -> jax.Array:
        """2 sqrt(max(0, gp(x,x))) with the reference's negative-variance
        clamp (lib/GaussianProcess.cpp:101-114)."""
        x = jnp.asarray(x)
        x2 = self._check_input(x)
        if x.ndim <= 1 and x2.shape[0] == 1:
            c = self.posterior_cov(x2[0], x2[0])
            return 2.0 * jnp.sqrt(jnp.maximum(0.0, c))
        var = self.posterior_var(x2)
        return 2.0 * jnp.sqrt(jnp.maximum(0.0, var))

    def sample_posterior(self, key, Xs, num_samples: int = 1, jitter: float = 1e-10):
        """Draw functions from the posterior at points Xs — the capability
        exercised by reference tests/PosteriorProcessTest.cpp:97-165 (which
        eigendecomposes the posterior covariance)."""
        Xs2 = self._check_input(jnp.asarray(Xs))
        mean = self.predict(Xs2)  # (m, q)
        Ks = kermod.gram(self.kernel, Xs2, self.X)
        Kss = kermod.gram(self.kernel, Xs2)
        cov = Kss - Ks @ self._core_solve(Ks.T)
        cov = 0.5 * (cov + cov.T)
        Lc, _ = linalg.safe_cholesky(cov, initial_jitter=jitter)
        eps = jax.random.normal(key, (num_samples, Xs2.shape[0], mean.shape[1]), mean.dtype)
        return mean[None] + jnp.einsum("ij,sjq->siq", Lc, eps)

    # --- internals ----------------------------------------------------------
    def _check_input(self, x: jax.Array) -> jax.Array:
        x = jnp.atleast_1d(x)
        if x.ndim == 1:
            if self.X.shape[1] == 1 and x.shape[0] != 1:
                return x[:, None]  # batch of scalar inputs on a 1-d GP
            if x.shape[0] != self.X.shape[1]:
                raise ValueError(
                    f"GaussianProcess::Predict: dimension of input vector "
                    f"({x.shape[0]}) does not correspond to the input "
                    f"dimension ({self.X.shape[1]})."
                )
            x = x[None, :]
        elif x.shape[-1] != self.X.shape[1]:
            raise ValueError(
                f"GaussianProcess::Predict: dimension of input vector "
                f"({x.shape[-1]}) does not correspond to the input dimension "
                f"({self.X.shape[1]})."
            )
        return x

    def _require_core(self) -> jax.Array:
        """Recompute the Cholesky factor if it was dropped (efficient-storage
        mode; reference recomputes the CoreMatrix lazily,
        lib/GaussianProcess.cpp:95-97)."""
        if self.L is not None:
            return self.L
        K = kermod.gram(self.kernel, self.X)
        K = linalg.add_diagonal(K, jnp.asarray(self.sigma) ** 2)
        L, _ = linalg.safe_cholesky(K)
        return L

    def _core_solve(self, B: jax.Array) -> jax.Array:
        """(K + sigma^2 I)^-1 B for the covariance paths: Cholesky solve
        when the factor is present, one GEMM against the stored explicit
        inverse when only ``core`` is (a :func:`load`-ed model — the
        reference's own prediction scheme, lib/GaussianProcess.cpp:83-99
        multiplies the CoreMatrix), full refactorization as the last
        resort (efficient storage)."""
        if self.L is not None:
            return linalg.cho_solve(self.L, B)
        if self.core is not None:
            return jnp.matmul(
                jnp.asarray(self.core, B.dtype), B,
                precision=matmul_precision(),
            )
        return linalg.cho_solve(self._require_core(), B)

    def materialize(self) -> "GP":
        """Return a GP with the Cholesky factor restored (one O(n^3)
        factorization).  Call once before repeated posterior_cov /
        credible_interval queries on an efficient-storage model — each
        query otherwise recomputes the factor from scratch (the reference
        caches its lazily-recomputed CoreMatrix,
        lib/GaussianProcess.cpp:95-97; an immutable pytree cannot, so the
        caching is explicit here) — or before ``extend``/``shrink``/
        ``loo_cv`` on a :func:`load`-ed model (those need the factor; the
        loaded ``core`` serves only the covariance-path solves)."""
        if self.L is not None:
            return self
        return dataclasses.replace(self, L=self._require_core())

    # --- diagnostics --------------------------------------------------------
    def describe(self) -> str:
        """Human-readable model summary — the reference's ``ToString``
        (lib/GaussianProcess.cpp:268-288), returned instead of printed."""
        bar = "---------------------------------------"
        lines = [
            bar,
            "Gaussian Process",
            f" - initialized:\t\t{self.alpha is not None}",
            f" - # samples:\t\t{self.num_samples}",
            f" - # labels:\t\t{self.Y.shape[0]}",
            f" - noise:\t\t{float(self.sigma)}",
            f" - input dimension:\t{self.input_dim}",
            f" - output dimension:\t{self.output_dim}",
            "",
            " - Kernel:",
            f"       - Type:\t\t{kernel_to_string(self.kernel)}",
            bar,
        ]
        return "\n".join(lines)

    def inversion_error(self) -> jax.Array:
        """Frobenius norm ‖(K + sigma² I)·C − I‖ with C = (L Lᵀ)⁻¹ — the
        reference's debug-mode inversion check
        (lib/GaussianProcess.cpp:507-509).  O(n³); diagnostics only."""
        K = kermod.gram(self.kernel, self.X)
        K = linalg.add_diagonal(K, jnp.asarray(self.sigma, K.dtype) ** 2)
        eye = jnp.eye(K.shape[0], dtype=K.dtype)
        C = self._core_solve(eye)
        return jnp.linalg.norm(
            jnp.matmul(K, C, precision=matmul_precision()) - eye
        )

    @property
    def num_samples(self) -> int:
        return self.X.shape[0]

    @property
    def input_dim(self) -> int:
        return self.X.shape[1]

    @property
    def output_dim(self) -> int:
        return self.Y.shape[1]

    # --- persistence --------------------------------------------------------
    def save(self, prefix: str) -> None:
        """Write the reference's 5-file artifact set
        (lib/GaussianProcess.cpp:133-180):
          {prefix}-RegressionVectors.txt   (n x q)
          {prefix}-CoreMatrix.txt          (n x n explicit inverse; 0x0 in
                                            efficient-storage mode)
          {prefix}-SampleVectors.txt       (d x n — column-major samples)
          {prefix}-LabelVectors.txt        (q x n)
          {prefix}-ParameterFile.txt       sigma dims flags + kernel string
        """
        import numpy as np

        matrixio.write_matrix(np.asarray(self.alpha), prefix + "-RegressionVectors.txt")
        if self.L is not None:
            eye = jnp.eye(self.L.shape[0], dtype=self.L.dtype)
            core = np.asarray(linalg.cho_solve(self.L, eye))
        elif self.core is not None:
            core = np.asarray(self.core)  # round-trip the loaded artifact
        else:
            core = np.zeros((0, 0))
        matrixio.write_matrix(core, prefix + "-CoreMatrix.txt")
        matrixio.write_matrix(np.asarray(self.X).T, prefix + "-SampleVectors.txt")
        matrixio.write_matrix(np.asarray(self.Y).T, prefix + "-LabelVectors.txt")
        efficient = 1 if self.L is None else 0
        with open(prefix + "-ParameterFile.txt", "w") as f:
            f.write(
                f"{float(self.sigma):.17g} {self.input_dim} {self.output_dim} "
                f"{efficient} 0 "
            )
            f.write(kernel_to_string(self.kernel))

    def __eq__(self, other) -> bool:
        """Deep comparison (reference lib/GaussianProcess.cpp:291-360)."""
        if not isinstance(other, GP):
            return NotImplemented
        import numpy as np

        def same(a, b):
            if a is None and b is None:
                return True
            if a is None or b is None:
                return False
            a, b = np.asarray(a), np.asarray(b)
            return a.shape == b.shape and bool(np.linalg.norm(a - b) == 0)

        return (
            same(self.alpha, other.alpha)
            and same(self.X, other.X)
            and same(self.Y, other.Y)
            and self.kernel == other.kernel
            and float(self.sigma) == float(other.sigma)
        )

    def __hash__(self):
        return id(self)


def _flatten_gp(gp: GP):
    return (gp.kernel, gp.X, gp.Y, gp.sigma, gp.alpha, gp.L, gp.core), None


def _unflatten_gp(_, children):
    return GP(*children)


tree_util.register_pytree_node(GP, _flatten_gp, _unflatten_gp)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def fit(
    kernel,
    X,
    Y,
    sigma: float = 0.0,
    efficient_storage: bool = False,
    jitter: float = 0.0,
    use_pallas_gram: bool = False,
) -> GP:
    """Train an exact GP: factor K + sigma^2 I and solve for the regression
    vectors (reference Initialize -> ComputeRegressionVectors,
    lib/GaussianProcess.cpp:117-130,641-672 — but via Cholesky solve instead
    of the explicit inverse).

    ``use_pallas_gram`` routes Gaussian/RationalQuadratic Gram construction
    through the fused Pallas tile kernel (~4x XLA on v5e at n=16k).
    Training is not differentiated, so the kernel's missing VJP is
    irrelevant here; leave it off when grads through ``fit`` are needed."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    if X.shape[0] == 0:
        raise ValueError(
            "GaussianProcess::Initialize: no input samples defined during initialization"
        )
    K = None
    if use_pallas_gram:
        from ..ops import pallas_gram

        interp = jax.default_backend() != "tpu"
        noise = jnp.asarray(sigma, jnp.float32) ** 2
        # K + sigma^2 I fused into the Gram kernel's HBM pass (the separate
        # scatter-based diagonal add costs ~11 ms at n=16k on v5e).  For
        # sizes on the blocked-Cholesky path, only the LOWER-triangle tiles
        # are computed/written (half the Gram flops and HBM writes) — the
        # sole consumer is safe_cholesky's potrf('L')-contract factorization.
        tril = X.shape[0] >= linalg._BLOCKED_MIN_N
        # (form, sigma, scale, third-param) per fused-tile kernel family;
        # GaussianExp is the Gaussian form under its log parameterization
        disp = None
        if isinstance(kernel, kermod.Gaussian):
            disp = ("gaussian", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.GaussianExp):
            disp = ("gaussian", jnp.exp(kernel.sigma), jnp.exp(kernel.scale), 1.0)
        elif isinstance(kernel, kermod.RationalQuadratic):
            disp = ("rq", kernel.sigma, kernel.scale, kernel.alpha)
        elif isinstance(kernel, kermod.Matern12):
            disp = ("matern12", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Matern32):
            disp = ("matern32", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Matern52):
            disp = ("matern52", kernel.sigma, kernel.scale, 1.0)
        elif isinstance(kernel, kermod.Periodic):
            disp = ("periodic", kernel.sigma, kernel.scale, kernel.b)
        if disp is not None:
            form, sg, sc, third = disp
            # One-dispatch fit: Gram construction + diagonal add +
            # factorization as a SINGLE pallas kernel (ops/pallas_fullchol.
            # gram_cholesky_fused) — the Gram matrix never exists in HBM
            # at all (measured −1.8 ms vs tril-gram -> safe_cholesky at
            # n=16k on v5e).  GPR_FIT_SCHEDULE=twopass restores the
            # separate-pass route for A/B.
            from ..ops import pallas_fullchol

            n = X.shape[0]
            if (
                form in pallas_fullchol._GRAM_FORMS
                and X.dtype == jnp.float32
                and n >= 512
                and jax.default_backend() == "tpu"
                and linalg._chol_schedule() == "fused"
                and os.environ.get("GPR_FIT_SCHEDULE", "fused") == "fused"
            ):
                # the kernel emits the panel-diagonal inverses alongside L,
                # so the regression solve is two block-GEMM substitution
                # sweeps (cho_solve_panels) instead of the blocked
                # triangular solves (−~1 ms inside fit at n=16k).
                # Arbitrary n rides this path via in-kernel pad masking
                # (gram_cholesky_fused row-pads X and factors
                # [[K, 0], [0, scale^2 I]] exactly); the panel width
                # trades pad flops ((n_pad/n)^3 - 1) against L-tile
                # stream volume (~n^3/(6*panel) bytes) — measured on v5e
                # (BENCHMARKS.md round 5): 512-aligned n keeps panel=512,
                # everything else pads to a 256 multiple.  Gate n >= 512:
                # at n=700 the fused path measured 0.11 ms vs the
                # twopass fallback's 1.43 (small-n fits are
                # dispatch-bound; ONE kernel wins outright).
                panel = 512 if n % 512 == 0 else 256
                n_pad = -(-n // panel) * panel
                L, W, _ = pallas_fullchol.safe_gram_cholesky_fused(
                    X, sg, sc, third, noise,
                    form=form, initial_jitter=jitter, panel=panel,
                    return_winv=True,
                )
                Yp = Y
                if n_pad != n:
                    Yp = jnp.concatenate(
                        [Y, jnp.zeros((n_pad - n, Y.shape[1]), Y.dtype)],
                        axis=0,
                    )
                alpha = pallas_fullchol.cho_solve_panels(L, W, Yp)
                if n_pad != n:
                    # leading principal factor of the block-diagonal padded
                    # system == chol(K + sigma^2 I); pad alphas are exact 0
                    alpha = alpha[:n]
                    L = L[:n, :n]
                return GP(
                    kernel=kernel,
                    X=X,
                    Y=Y,
                    sigma=jnp.asarray(sigma, X.dtype),
                    alpha=alpha,
                    L=None if efficient_storage else L,
                )
            K = pallas_gram.gram_pallas(
                X, X, sg, sc, third, diag=noise,
                form=form, interpret=interp, tril=tril,
            ).astype(X.dtype)
    if K is None:
        K = kermod.gram(kernel, X)
        K = linalg.add_diagonal(K, jnp.asarray(sigma, K.dtype) ** 2)
    L, _ = linalg.safe_cholesky(K, initial_jitter=jitter)
    alpha = linalg.cho_solve(L, Y)
    return GP(
        kernel=kernel,
        X=X,
        Y=Y,
        sigma=jnp.asarray(sigma, K.dtype),
        alpha=alpha,
        L=None if efficient_storage else L,
    )


def load(prefix: str, dtype=None) -> GP:
    """Load a model saved by :meth:`GP.save` — or by the reference's
    ``GaussianProcess::Save`` (lib/GaussianProcess.cpp:183-268)."""
    import numpy as np

    for suffix in (
        "-RegressionVectors.txt",
        "-CoreMatrix.txt",
        "-SampleVectors.txt",
        "-LabelVectors.txt",
        "-ParameterFile.txt",
    ):
        path = prefix + suffix
        if not os.path.exists(path) or os.path.isdir(path):
            raise FileNotFoundError(
                f"GaussianProcess::Load: {path} does not exist or is a directory."
            )

    alpha = matrixio.read_matrix(prefix + "-RegressionVectors.txt", dtype)
    core = matrixio.read_matrix(prefix + "-CoreMatrix.txt", dtype)
    X = matrixio.read_matrix(prefix + "-SampleVectors.txt", dtype).T
    Y = matrixio.read_matrix(prefix + "-LabelVectors.txt", dtype).T

    with open(prefix + "-ParameterFile.txt") as f:
        line = f.readline()
    parts = line.split(None, 5)
    if len(parts) < 6:
        raise ValueError("GaussianProcess::Load: parameter file is corrupt")
    sigma = float(parts[0])
    kernel = parse_kernel(parts[5].strip())

    return GP(
        kernel=kernel,
        X=jnp.asarray(X),
        Y=jnp.asarray(Y),
        sigma=jnp.asarray(sigma, jnp.asarray(X).dtype),
        alpha=jnp.asarray(alpha),
        # the stored CoreMatrix is consumed DIRECTLY (reference
        # lib/GaussianProcess.cpp:183-268): covariance-path solves run as
        # one GEMM against it, so load costs no O(n^3) refactorization
        # (round-4 VERDICT: serve cold-start at n=3773 paid a full refit).
        # ``materialize()`` restores a Cholesky factor when extend/shrink/
        # loo_cv are needed on a loaded model.
        L=None,
        core=jnp.asarray(core) if core.size else None,
    )


def loo_cv(gp: GP):
    """Exact leave-one-out cross-validation from ONE factorization.

    For A = K + sigma^2 I and alpha = A^-1 Y, the classic identities
    (Rasmussen & Williams 5.10-5.12):

        loo_mean_i = y_i - alpha_i / (A^-1)_ii
        loo_var_i  = 1 / (A^-1)_ii

    give every held-out posterior without n refits — O(n^3) total instead
    of O(n^4).  Beyond the reference's capability surface (it selects
    models by training error and paper-level validation only); returns
    (loo_mean (n, q), loo_var (n,), log predictive density scalar)."""
    import math

    L = gp._require_core()
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    # diag(A^-1) = sum_k (L^{-1})_{ki}^2 — one triangular solve, half the
    # cost of the explicit inverse and no n x n buffer
    Linv = linalg._tri_solve(L, eye, trans=False)
    diag = jnp.sum(Linv * Linv, axis=0)
    loo_mean = gp.Y - gp.alpha / diag[:, None]
    loo_var = 1.0 / diag
    resid = gp.Y - loo_mean
    lpd = jnp.sum(
        -0.5 * jnp.log(2 * math.pi * loo_var)[:, None]
        - 0.5 * resid**2 / loo_var[:, None]
    )
    return loo_mean, loo_var, lpd


def extend(gp: GP, Xn, Yn, jitter: float = 0.0) -> GP:
    """Add samples to a trained GP in O(n^2 k) — the online-serving
    replacement for the reference's AddSample + Initialize, which
    re-factorizes the full (n+k)^2 Gram from scratch each time
    (reference lib/GaussianProcess.cpp:117-130; GaussianProcess.h's
    m_Initialized flag forces the full recomputation).

    With A = [[K11, K12], [K12^T, K22]] + sigma^2 I and L11 = chol(K11 +
    sigma^2 I) already known, the factor grows by one block row:

        B = (L11^{-1} K12)^T               one triangular solve, (n, k)
        C = chol(K22 + sigma^2 I - B B^T)  one (k, k) factorization

    and the regression vectors are re-solved against the extended factor
    (O((n+k)^2 q)).  Equal to ``fit`` on the concatenated data up to float
    rounding (same Gram formulas, same noise placement)."""
    Xn = jnp.asarray(Xn)
    Yn = jnp.asarray(Yn)
    if Xn.ndim == 1:
        Xn = Xn[:, None]
    if Yn.ndim == 1:
        Yn = Yn[:, None]
    if gp.L is None:
        raise ValueError(
            "extend: efficient-storage GP has no factor; call "
            "gp.materialize() first"
        )
    L11 = gp.L
    prec = matmul_precision()
    K12 = kermod.gram(gp.kernel, gp.X, Xn)  # (n, k)
    K22 = kermod.gram(gp.kernel, Xn)
    noise = jnp.asarray(gp.sigma, K22.dtype) ** 2 + jitter
    Bt = linalg._tri_solve(L11, K12, trans=False)  # L11^{-1} K12, (n, k)
    S = linalg.add_diagonal(K22, noise) - jnp.matmul(
        Bt.T, Bt, precision=prec
    )
    C, _ = linalg.safe_cholesky(S)
    n, k = K12.shape
    Lnew = jnp.zeros((n + k, n + k), L11.dtype)
    Lnew = Lnew.at[:n, :n].set(L11)
    Lnew = Lnew.at[n:, :n].set(Bt.T)
    Lnew = Lnew.at[n:, n:].set(C)
    X = jnp.concatenate([gp.X, Xn], axis=0)
    Y = jnp.concatenate([gp.Y, Yn], axis=0)
    alpha = linalg.cho_solve(Lnew, Y)
    return GP(kernel=gp.kernel, X=X, Y=Y, sigma=gp.sigma, alpha=alpha,
              L=Lnew)


def _cholupdate(L: jax.Array, v: jax.Array) -> jax.Array:
    """chol(L L^T + v v^T) by the classic sequential column sweep
    (Golub & Van Loan 6.5.4), expressed as a ``fori_loop`` with
    static-shape column ops.  Each iteration touches exactly one column —
    O(n) reads and writes via dynamic slices — keeping the whole update
    O(n^2) (a full-matrix masked write per column would silently make it
    O(n^3), slower than re-factorizing)."""
    n = L.shape[0]
    rows = jnp.arange(n)

    def body(j, carry):
        L, v = carry
        d = jax.lax.dynamic_slice(L, (j, j), (1, 1))[0, 0]
        vj = jax.lax.dynamic_slice(v, (j,), (1,))[0]
        r = jnp.sqrt(d * d + vj * vj)
        c = r / d
        s = vj / d
        colj = jax.lax.dynamic_slice(L, (0, j), (n, 1))[:, 0]
        below = rows > j
        new_col = jnp.where(below, (colj + s * v) / c, colj)
        new_col = jnp.where(rows == j, r, new_col)
        L = jax.lax.dynamic_update_slice(L, new_col[:, None], (0, j))
        v = jnp.where(below, c * v - s * new_col, v)
        return L, v

    L, _ = jax.lax.fori_loop(0, n, body, (L, jnp.asarray(v, L.dtype)))
    return L


def shrink(gp: GP, k: int = 1) -> GP:
    """Drop the OLDEST ``k`` samples in O(n^2 k) — the sliding-window
    companion of :func:`extend` (together they replace the reference's
    full per-window re-fit in the drift loop, scripts/validation_drift.py
    semantics re-built in apps/drift.py).

    Removing row 0 of A leaves A' whose factor satisfies
    L22' L22'^T = L22 L22^T + l21 l21^T with [l11; l21; L22] the old
    factor's first column split — one rank-1 Cholesky UPDATE of the
    trailing block per dropped sample.  Equal to ``fit`` on the remaining
    data up to float rounding."""
    if gp.L is None:
        raise ValueError(
            "shrink: efficient-storage GP has no factor; call "
            "gp.materialize() first"
        )
    if not 0 < k < gp.num_samples:
        raise ValueError(f"shrink: k={k} outside (0, {gp.num_samples})")
    L = gp.L
    for _ in range(k):
        L = _cholupdate(L[1:, 1:], L[1:, 0])
    X = gp.X[k:]
    Y = gp.Y[k:]
    alpha = linalg.cho_solve(L, Y)
    return GP(kernel=gp.kernel, X=X, Y=Y, sigma=gp.sigma, alpha=alpha, L=L)
