"""Cubic B-spline image resampling — jittable, N-D.

The reference's default warping interpolator is the cubic B-spline
(reference include/itkUtils.h:1098-1158: ``WarpImage``/``WarpImage2`` set a
``BSplineInterpolateImageFunction`` at :1139-1146; ITK's spline machinery is
Unser's recursive-filter decomposition).  ``jax.scipy.ndimage.
map_coordinates`` stops at order 1, so this module supplies the two halves
of the classic algorithm (Unser, "Splines: a perfect fit", 1999):

  1. ``spline_filter`` — the coefficient prefilter: per axis, one causal +
     one anticausal first-order IIR recursion with pole z1 = sqrt(3) - 2,
     mirror boundary conditions (exact closed-form initialization, the
     same contract as ``scipy.ndimage.spline_filter(..., mode='mirror')``
     and ITK's BSplineDecompositionImageFilter).  The recursions run as
     ``lax.scan`` over the axis, vectorized across all other axes.
  2. ``map_coordinates_cubic`` — evaluation: 4 taps per axis with the
     cubic B-spline kernel weights, mirror index folding, one fused
     weighted gather sum (4^nd terms, python-unrolled: static offsets,
     XLA-fusable).

Goldens: tests/test_warp.py checks both against
``scipy.ndimage.map_coordinates(order=3, mode='mirror')``.
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp

# cubic B-spline pole (Unser 1999, table 1)
_Z1 = math.sqrt(3.0) - 2.0


def _filter_axis0(s: jax.Array) -> jax.Array:
    """Cubic-spline coefficient filter along axis 0 (mirror boundaries).

    ``s``: (n, ...) samples -> (n, ...) coefficients.  Gain 6 = 1/B3(1)
    normalization folded into the input (scipy ni_splines.c does the
    same); causal/anticausal initializations are the EXACT mirror-period
    closed forms, so results match scipy to rounding at any n."""
    n = s.shape[0]
    if n == 1:
        return s
    z = jnp.asarray(_Z1, s.dtype)
    c = s * 6.0

    # causal init — the mirror-period (p = 2n-2) geometric sum:
    #   c+[0] = (c[0] + z^{n-1} c[n-1]
    #             + sum_{k=1}^{n-2} (z^k + z^{2n-2-k}) c[k]) / (1 - z^{2n-2})
    k = jnp.arange(n, dtype=s.dtype)
    zk = z**k
    w = zk + z ** (2.0 * (n - 1.0) - k)
    w = w.at[0].set(1.0)
    w = w.at[n - 1].set(z ** (n - 1.0))
    denom = 1.0 - z ** (2.0 * (n - 1.0))
    c0 = jnp.tensordot(w / denom, c, axes=(0, 0))  # (...,)

    def causal(carry, x):
        out = x + z * carry
        return out, out

    _, cp_rest = jax.lax.scan(causal, c0, c[1:])
    cp = jnp.concatenate([c0[None], cp_rest], axis=0)

    # anticausal init (mirror): c-[n-1] = z/(z^2 - 1) * (c+[n-1] + z c+[n-2])
    cn = (z / (z * z - 1.0)) * (cp[n - 1] + z * cp[n - 2])

    def anticausal(carry, x):
        out = z * (carry - x)
        return out, out

    _, cm_rest = jax.lax.scan(anticausal, cn, cp[: n - 1], reverse=True)
    return jnp.concatenate([cm_rest, cn[None]], axis=0)


def spline_filter(data: jax.Array) -> jax.Array:
    """Cubic B-spline coefficient array of ``data`` (all axes filtered,
    mirror boundaries) — ``scipy.ndimage.spline_filter(order=3,
    mode='mirror')``."""
    data = jnp.asarray(data)
    for ax in range(data.ndim):
        data = jnp.moveaxis(
            _filter_axis0(jnp.moveaxis(data, ax, 0)), 0, ax
        )
    return data


def _mirror_index(i: jax.Array, n: int) -> jax.Array:
    """Fold integer indices into [0, n) by mirror reflection about the end
    samples (period 2n-2; no edge repeat) — scipy/ITK 'mirror'."""
    if n == 1:
        return jnp.zeros_like(i)
    p = 2 * n - 2
    i = jnp.abs(i) % p
    return jnp.where(i >= n, p - i, i)


def _cubic_weights(f: jax.Array):
    """B-spline kernel weights for the 4 taps at offsets (-1, 0, 1, 2)
    around the base sample, f = frac(t) in [0, 1)."""
    f2 = f * f
    f3 = f2 * f
    w0 = (1.0 - 3.0 * f + 3.0 * f2 - f3) * (1.0 / 6.0)
    w1 = (4.0 - 6.0 * f2 + 3.0 * f3) * (1.0 / 6.0)
    w2 = (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) * (1.0 / 6.0)
    w3 = f3 * (1.0 / 6.0)
    return (w0, w1, w2, w3)


def map_coordinates_cubic(
    image: jax.Array, coords, prefilter: bool = True
) -> jax.Array:
    """Sample ``image`` at fractional index coordinates with cubic
    B-spline interpolation, mirror boundaries — the order-3 counterpart of
    ``jax.scipy.ndimage.map_coordinates`` (matches ``scipy.ndimage.
    map_coordinates(order=3, mode='mirror')``).

    ``coords``: sequence of nd arrays (one per image axis, any common
    shape).  ``prefilter=False`` treats ``image`` as spline COEFFICIENTS
    (pass the output of :func:`spline_filter`; e.g. filter once, evaluate
    many)."""
    image = jnp.asarray(image)
    nd = image.ndim
    if len(coords) != nd:
        raise ValueError(
            f"map_coordinates_cubic: {len(coords)} coords for {nd}-d image"
        )
    coef = spline_filter(image) if prefilter else image
    coords = [jnp.asarray(c, coef.dtype) for c in coords]

    idx, wts = [], []
    for ax in range(nd):
        t = coords[ax]
        base = jnp.floor(t)
        f = t - base
        b = base.astype(jnp.int32)
        idx.append([
            _mirror_index(b + k - 1, image.shape[ax]) for k in range(4)
        ])
        wts.append(_cubic_weights(f))

    out = jnp.zeros(coords[0].shape, coef.dtype)
    for taps in itertools.product(range(4), repeat=nd):
        w = wts[0][taps[0]]
        for ax in range(1, nd):
            w = w * wts[ax][taps[ax]]
        gathered = coef[tuple(idx[ax][taps[ax]] for ax in range(nd))]
        out = out + w * gathered
    return out
