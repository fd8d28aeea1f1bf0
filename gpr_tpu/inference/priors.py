"""Prior densities over hyperparameters.

Re-design of the reference density hierarchy (reference include/Prior.h:
66-751): Gaussian, LogGaussian, InverseGaussian and Gamma densities with
pdf / log-pdf / cdf / bisection icdf / sampling / mode-variance parameter
solvers.  Sampling uses JAX PRNG keys (functional, reproducible across
hosts) instead of the reference's process-global ``std::default_random_engine``
(Prior.h:119,128-129).

All log-pdfs are jittable and differentiable — they feed directly into the
MAP objective and the HMC log-posterior.  The reference's analytic
``GetDerivative`` / ``GetLogDerivative`` forms are kept as methods (used as
golden tests against ``jax.grad``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import tree_util
from jax.scipy import special as jsp


def _sgn(x):
    return jnp.sign(x)


class Density:
    """Base density (reference Prior.h:66-127)."""

    def __call__(self, x):
        return self.pdf(jnp.asarray(x))

    def pdf(self, x):
        raise NotImplementedError

    def log_pdf(self, x):
        raise NotImplementedError

    def cdf(self, x):
        raise NotImplementedError

    def mean(self):
        raise NotImplementedError

    def variance(self):
        raise NotImplementedError

    def mode(self):
        raise NotImplementedError

    def sample(self, key, shape=()):
        raise NotImplementedError

    def log_derivative(self, x):
        """d/dx log p(x) — analytic, matching the reference's
        GetLogDerivative."""
        raise NotImplementedError

    # bisection bracket matching the density's support: positive-support
    # densities (log-Gaussian, inverse-Gaussian, Gamma) have NaN cdfs at
    # negative x, and a NaN bracket endpoint silently collapses the
    # bisection to a wrong constant (the reference RAISES a domain error,
    # Prior.h:88-89)
    icdf_support = (-1e8, 1e8)

    def icdf(self, u, a=None, b=None, iters: int = 1000, tol: float = 1e-10):
        """Bisection inverse-cdf (reference Density::icdf, Prior.h:87-116).

        ``a``/``b`` default to the density's support bracket;
        ``tol`` bounds the bracket width (it caps the iteration count when
        the bracket is concrete)."""
        if a is None:
            a = self.icdf_support[0]
        if b is None:
            b = self.icdf_support[1]
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            span = float(b) - float(a)
            if span > 0 and tol > 0:
                import math as _m

                iters = min(iters, max(1, int(_m.ceil(_m.log2(span / tol)))))
        u = jnp.asarray(u, jnp.result_type(float))
        a = jnp.broadcast_to(jnp.asarray(a, u.dtype), u.shape)
        b = jnp.broadcast_to(jnp.asarray(b, u.dtype), u.shape)

        def body(_, ab):
            a, b = ab
            c = 0.5 * (a + b)
            f = self.cdf(c) - u
            fa = self.cdf(a) - u
            b_new = jnp.where(_sgn(fa) != _sgn(f), c, b)
            a_new = jnp.where(_sgn(self.cdf(b) - u) != _sgn(f), c, a)
            return a_new, b_new

        a, b = jax.lax.fori_loop(0, iters, body, (a, b))
        return 0.5 * (a + b)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(d):
        return tuple(getattr(d, f) for f in fields), None

    def unflatten(_, children):
        return cls(*children)

    tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


# ---------------------------------------------------------------------------


@_register
@dataclasses.dataclass(frozen=True)
class GaussianDensity(Density):
    """N(mu, sigma^2) (reference Prior.h:138-191)."""

    mu: Any
    sigma: Any

    def __post_init__(self):
        if not isinstance(self.sigma, jax.core.Tracer) and float(self.sigma) <= 0:
            raise ValueError(
                "GaussianDensity: the Gaussian density is only defined for sigma>0"
            )

    def pdf(self, x):
        s = self.sigma
        return 1.0 / (s * jnp.sqrt(2 * jnp.pi)) * jnp.exp(
            -((x - self.mu) ** 2) / (2 * s**2)
        )

    def log_pdf(self, x):
        s = self.sigma
        return -jnp.log(s * jnp.sqrt(2 * jnp.pi)) - (x - self.mu) ** 2 / (2 * s**2)

    def derivative(self, x):
        """Reference Prior.h:159-161."""
        s = self.sigma
        return (
            -(x - self.mu)
            * jnp.exp(-((x - self.mu) ** 2) / (2 * s**2))
            / (jnp.sqrt(2.0) * jnp.sqrt(jnp.pi) * s**3)
        )

    def log_derivative(self, x):
        return -(x - self.mu) / self.sigma**2

    def cdf(self, x):
        return 0.5 * (1 + jax.scipy.special.erf((x - self.mu) / (self.sigma * jnp.sqrt(2.0))))

    def mean(self):
        return self.mu

    def variance(self):
        # NOTE: the reference returns sigma (the std), not sigma^2
        # (Prior.h:175-177); we keep the mathematically correct variance and
        # expose std separately.
        return self.sigma**2

    def std(self):
        return self.sigma

    def mode(self):
        return self.mu

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape)


@_register
@dataclasses.dataclass(frozen=True)
class LogGaussianDensity(Density):
    """log-normal (reference Prior.h:199-432)."""

    icdf_support = (1e-12, 1e8)

    mu: Any
    sigma: Any

    def __post_init__(self):
        if not isinstance(self.sigma, jax.core.Tracer) and float(self.sigma) <= 0:
            raise ValueError(
                "LogGaussianDensity: the LogGaussian density is only defined for sigma>0"
            )

    def pdf(self, x):
        m, s = self.mu, self.sigma
        return (
            1.0
            / (x * s * jnp.sqrt(2 * jnp.pi))
            * jnp.exp(-((jnp.log(x) - m) ** 2) / (2 * s**2))
        )

    def log_pdf(self, x):
        m, s = self.mu, self.sigma
        return (
            -jnp.log(x * s * jnp.sqrt(2 * jnp.pi))
            - (jnp.log(x) - m) ** 2 / (2 * s**2)
        )

    def log_derivative(self, x):
        """Reference Prior.h:235-238."""
        m, s = self.mu, self.sigma
        return -(jnp.log(x) + s**2 - m) / (s**2 * x)

    def cdf(self, x):
        m, s = self.mu, self.sigma
        return 0.5 + 0.5 * jax.scipy.special.erf((jnp.log(x) - m) / (jnp.sqrt(2.0) * s))

    def mean(self):
        return jnp.exp(self.mu + self.sigma**2 / 2)

    def variance(self):
        s2 = self.sigma**2
        return (jnp.exp(s2) - 1) * jnp.exp(2 * self.mu + s2)

    def mode(self):
        return jnp.exp(self.mu - self.sigma**2)

    def sample(self, key, shape=()):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape))

    @staticmethod
    def from_mode_and_variance(mode: float, variance: float) -> "LogGaussianDensity":
        """Solve (mu, sigma) from (mode, variance) — reference
        Prior.h:262-425 uses a 2-D Halley iteration; here we use the same
        fixed-point initialization followed by damped Newton on the 2x2
        system (float64, host-side)."""
        import numpy as np

        mode = float(mode)
        variance = float(variance)

        # fixed-point initialization (reference Prior.h:364-388)
        s = 0.0
        avg, cnt = 0.0, 0
        for i in range(20):
            s = math.sqrt(
                math.log(1 + variance / math.exp(math.log(mode) + 1.5 * s * s))
            )
            if i > 10:
                avg += s
                cnt += 1
        if cnt:
            s = avg / cnt
        mu = math.log(mode) + s * s

        def F(mu, s):
            f1 = math.exp(mu - s * s) - mode
            f2 = (math.exp(s * s) - 1) * math.exp(2 * mu + s * s) - variance
            return np.array([f1, f2])

        def J(mu, s):
            j11 = math.exp(mu - s * s)
            j12 = -2 * s * math.exp(mu - s * s)
            j21 = 2 * (math.exp(s * s) - 1) * math.exp(2 * mu + s * s)
            j22 = 2 * s * (2 * math.exp(s * s) - 1) * math.exp(2 * mu + s * s)
            return np.array([[j11, j12], [j21, j22]])

        p = np.array([mu, s])
        for _ in range(200):
            f = F(p[0], p[1])
            try:
                step = np.linalg.solve(J(p[0], p[1]), f)
            except np.linalg.LinAlgError:
                break
            p_new = p - step
            if not np.all(np.isfinite(p_new)):
                break
            if np.linalg.norm(p_new - p) < 1e-15:
                p = p_new
                break
            p = p_new

        mu, s = float(p[0]), abs(float(p[1]))
        err_mode = abs(math.exp(mu - s * s) - mode)
        err_var = abs((math.exp(s * s) - 1) * math.exp(2 * mu + s * s) - variance)
        if err_mode > 1e-10 or err_var > 1e-10 or math.isnan(mu) or math.isnan(s):
            raise ValueError(
                f"LogGaussianDensity::GetMuAndSigma: cannot determ mu and sigma "
                f"for mode={mode} and variance={variance}. Errors: mode "
                f"{err_mode}, variance {err_var}"
            )
        return LogGaussianDensity(mu, s)


@_register
@dataclasses.dataclass(frozen=True)
class InverseGaussianDensity(Density):
    """Inverse Gaussian / Wald (reference Prior.h:442-668).

    p(x | lambda, mu) = sqrt(lambda/(2 pi x^3)) exp(-lambda (x-mu)^2 / (2 mu^2 x))
    """

    icdf_support = (1e-12, 1e8)

    lam: Any
    mu: Any

    def __post_init__(self):
        for name in ("lam", "mu"):
            v = getattr(self, name)
            if not isinstance(v, jax.core.Tracer) and float(v) <= 0:
                raise ValueError(
                    "InverseGaussianDensity: the inverse Gaussian density is "
                    "only defined for lambda>0 and mu>0"
                )

    def pdf(self, x):
        lam, mu = self.lam, self.mu
        return jnp.sqrt(lam / (2 * jnp.pi * x**3)) * jnp.exp(
            -lam * (x - mu) ** 2 / (2 * mu**2 * x)
        )

    def log_pdf(self, x):
        lam, mu = self.lam, self.mu
        return 0.5 * (jnp.log(lam) - jnp.log(2 * jnp.pi) - 3 * jnp.log(x)) - lam * (
            x - mu
        ) ** 2 / (2 * mu**2 * x)

    def log_derivative(self, x):
        """Reference Prior.h:486-488."""
        lam, mu = self.lam, self.mu
        return -3 / (2 * x) + lam / (2 * x**2) - lam / (2 * mu**2)

    def cdf(self, x):
        lam, mu = self.lam, self.mu
        x = jnp.asarray(x)
        phi = lambda t: 0.5 * (1 + jax.scipy.special.erf(t / jnp.sqrt(2.0)))
        safe_x = jnp.where(x > 0, x, 1.0)
        val = phi(jnp.sqrt(lam / safe_x) * (safe_x / mu - 1)) + jnp.exp(
            jnp.minimum(2 * lam / mu, jnp.log(jnp.finfo(x.dtype).max))
        ) * phi(-jnp.sqrt(lam / safe_x) * (safe_x / mu + 1))
        return jnp.where(x > 0, val, 0.0)

    def mean(self):
        return self.mu

    def variance(self):
        return self.mu**3 / self.lam

    def mode(self):
        mu, lam = self.mu, self.lam
        return mu * (jnp.sqrt(1 + 9 * mu**2 / (4 * lam**2)) - 3 * mu / (2 * lam))

    def sample(self, key, shape=()):
        """Michael-Schucany-Haas transformation sampling (reference
        Prior.h:466-478)."""
        mu, lam = self.mu, self.lam
        k1, k2 = jax.random.split(key)
        v = jax.random.normal(k1, shape)
        y = v * v
        x = (
            mu
            + mu**2 * y / (2 * lam)
            - mu / (2 * lam) * jnp.sqrt(4 * mu * lam * y + mu**2 * y**2)
        )
        z = jax.random.uniform(k2, shape)
        return jnp.where(z <= mu / (mu + x), x, mu**2 / x)

    @staticmethod
    def from_mode_and_variance(
        mode: float, variance: float, method: str = "halley"
    ) -> "InverseGaussianDensity":
        """Solve (lambda, mu) from (mode, variance) — reference
        Prior.h:547-662 (Halley's method / bisection)."""
        mode = float(mode)
        variance = float(variance)

        def f(mu):
            return (
                math.sqrt(4 * mu**4 + 9 * variance**2) - 2 * mode * mu - 3 * variance
            ) / (2 * mu)

        if method == "halley":

            def df(mu):
                r = math.sqrt(4 * mu**4 + 9 * variance**2)
                return (3 * variance * (r - 3 * variance) + 4 * mu**4) / (
                    2 * mu**2 * r
                )

            def ddf(mu):
                a = 4 * mu**4 + 9 * variance**2
                r = math.sqrt(a**3)
                return -(
                    3
                    * variance
                    * (r - 36 * variance * mu**4 - 27 * variance**3)
                ) / (mu**3 * r)

            mu = 1.6
            for _ in range(100):
                fm, dfm, ddfm = f(mu), df(mu), ddf(mu)
                mu_new = mu - (2 * fm * dfm) / (2 * dfm**2 - fm * ddfm)
                if abs(mu_new - mu) < 1e-14:
                    mu = mu_new
                    break
                mu = mu_new
        else:  # bisection (reference Prior.h:619-662)
            a, b = 1e-16, 1e8
            mu = 0.0
            for _ in range(1000):
                c = 0.5 * (a + b)
                fc = f(c)
                if abs(a - c) < 1e-14:
                    mu = c
                    break
                if math.copysign(1, f(a)) != math.copysign(1, fc):
                    b = c
                if math.copysign(1, f(b)) != math.copysign(1, fc):
                    a = c

        lam = mu**3 / variance
        cand = InverseGaussianDensity(lam, mu)
        if (
            abs(float(cand.mode()) - mode) > 1e-10
            or math.isnan(mu)
            or math.isinf(mu)
        ):
            raise ValueError(
                f"InverseGaussianDensity::GetMeanAndLambda: cannot determ mean "
                f"and lambda for mode={mode} and variance={variance}"
            )
        return cand


@_register
@dataclasses.dataclass(frozen=True)
class GammaDensity(Density):
    """Gamma with *rate* beta (reference Prior.h:677-751).

    The reference's pdf normalization mixes rate and scale conventions
    (Prior.h:694 uses beta^alpha with exp(-x/beta)); its cdf / mean /
    variance / mode and the mode-variance solvers are all consistent with
    the RATE convention, which is what we implement:
        p(x) = beta^alpha / Gamma(alpha) x^(alpha-1) exp(-beta x)
    """

    icdf_support = (1e-12, 1e8)

    alpha: Any
    beta: Any

    def __post_init__(self):
        for name in ("alpha", "beta"):
            v = getattr(self, name)
            if not isinstance(v, jax.core.Tracer) and float(v) <= 0:
                raise ValueError(
                    "GammaDensity: the Gamma density is only defined for "
                    "alpha>0 and beta>0"
                )

    def pdf(self, x):
        a, b = self.alpha, self.beta
        return jnp.exp(self.log_pdf(x))

    def log_pdf(self, x):
        a, b = self.alpha, self.beta
        return a * jnp.log(b) - jsp.gammaln(a) + (a - 1) * jnp.log(x) - b * x

    def log_derivative(self, x):
        return (self.alpha - 1) / x - self.beta

    def cdf(self, x):
        """Reference Prior.h:719-721: tgamma_lower(alpha, beta*x)/Gamma(alpha)."""
        return jsp.gammainc(self.alpha, self.beta * jnp.asarray(x))

    def mean(self):
        return self.alpha / self.beta

    def variance(self):
        return self.alpha / self.beta**2

    def mode(self):
        return (self.alpha - 1) / self.beta

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.alpha, shape) / self.beta

    @staticmethod
    def get_alpha(mode: float, variance: float) -> float:
        """Reference Prior.h:739-741."""
        m2 = mode * mode
        return (math.sqrt(m2 * (m2 + 4 * variance)) + m2 + 2 * variance) / (
            2 * variance
        )

    @staticmethod
    def get_beta(mode: float, variance: float) -> float:
        """Reference Prior.h:742-744."""
        return math.sqrt(GammaDensity.get_alpha(mode, variance) / variance)

    @staticmethod
    def from_mode_and_variance(mode: float, variance: float) -> "GammaDensity":
        return GammaDensity(
            GammaDensity.get_alpha(mode, variance),
            GammaDensity.get_beta(mode, variance),
        )


def get_samples(density: Density, n: int):
    """Equidistant inverse-transform samples clipped to mode +/- std
    (reference include/PriorUtils.h:33-58) — used for brute-force MAP grids."""
    import numpy as np

    mode = float(density.mode())
    std = math.sqrt(abs(float(density.variance())))
    lo = max(mode - std, 1e-10)
    hi = mode + std
    u_lo = float(density.cdf(lo))
    u_hi = float(density.cdf(hi))
    us = np.linspace(u_lo, u_hi, n)
    return np.array([float(density.icdf(u, a=1e-10, b=1e8)) for u in us])
