"""Image warping by dense displacement fields — jittable.

Replaces the reference's ITK warping stack (reference
include/itkUtils.h:1098-1158 ``WarpImage``/``WarpImage2``: WarpImageFilter +
B-spline interpolation set at :1139-1146) with a vectorized JAX resampler:
the warped value at voxel x is image(x + d(x)/spacing) (ITK's
WarpImageFilter semantics with physical-space displacements).  Orders 0/1
route through ``jax.scipy.ndimage.map_coordinates``; order 3 — the
reference's DEFAULT interpolator, and the default here for ``warp_image``
— through :mod:`gpr_tpu.pipeline.bspline` (cubic B-spline prefilter +
4-tap kernel, mirror boundaries, matching ITK's
BSplineInterpolateImageFunction and scipy's mode='mirror').  Also provides
displacement magnitudes (itkUtils.h:1172-1180) and the diff-image
evaluation used by the reference pipeline (scripts/main.py:336-405).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import imageio


def warp_array(
    image: jax.Array,
    displacement: jax.Array,
    spacing=None,
    order: int = 1,
    mode: str = "nearest",
) -> jax.Array:
    """Warp ``image`` [z, y, x] by ``displacement`` [z, y, x, 3].

    The displacement is in PHYSICAL units with components ordered (dx, dy,
    dz) — x fastest, like the reference's DVFs — and is divided by the voxel
    spacing (sx, sy, sz) to get index-space offsets.  order=1 trilinear
    (fast path), order=3 cubic B-spline (the reference's default
    interpolator; mirror boundaries — ``mode`` is ignored for order 3)."""
    image = jnp.asarray(image)
    displacement = jnp.asarray(displacement)
    nd = image.ndim
    if spacing is None:
        spacing = (1.0,) * nd
    grid = jnp.meshgrid(
        *[jnp.arange(s, dtype=image.dtype) for s in image.shape], indexing="ij"
    )  # [z, y, x] index grids
    # displacement component c maps to axis (nd-1-c): dx -> x (last axis)
    coords = [
        grid[ax] + displacement[..., nd - 1 - ax] / spacing[nd - 1 - ax]
        for ax in range(nd)
    ]
    if order == 3:
        from .bspline import map_coordinates_cubic

        return map_coordinates_cubic(image, coords)
    return jax.scipy.ndimage.map_coordinates(image, coords, order=order, mode=mode)


def warp_image(
    img: imageio.Image, df: imageio.Image, order: int = 3
) -> imageio.Image:
    """Warp a scalar Image by a displacement-field Image (reference
    WarpImage, itkUtils.h:1098-1114 — output geometry follows the field).
    Default order 3 = cubic B-spline, the reference's interpolator
    (itkUtils.h:1139-1146); pass order=1 for the trilinear fast path."""
    if df.ncomponents < 2:
        raise ValueError("warp_image: displacement field must be vector-valued")
    warped = warp_array(
        jnp.asarray(img.data, jnp.float64),
        jnp.asarray(df.data, jnp.float64),
        spacing=df.spacing,
        order=order,
    )
    return imageio.Image(
        np.asarray(warped), df.spacing, df.origin, ncomponents=1
    )


def displacement_magnitude(df: imageio.Image) -> np.ndarray:
    """Per-voxel L2 magnitude (reference itkUtils.h:1172-1180)."""
    return np.linalg.norm(np.asarray(df.data), axis=-1)


def diff_image(
    gt: imageio.Image, pred: imageio.Image
) -> imageio.Image:
    """Per-voxel displacement difference field (the reference's evaluation
    artifact, scripts/main.py:366-377 / validation_dvf.py:85-92)."""
    data = np.asarray(gt.data) - np.asarray(pred.data)
    return imageio.Image(data, gt.spacing, gt.origin, ncomponents=gt.ncomponents)
