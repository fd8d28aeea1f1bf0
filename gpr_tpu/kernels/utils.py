"""Kernel construction utilities (reference include/KernelUtils.h:43-89)."""

from __future__ import annotations

from typing import Sequence

from .kernels import Gaussian, Kernel, Periodic, Product, RationalQuadratic, Sum, White


def get_general_kernel(params: Sequence) -> Kernel:
    """The 'highly general' composite kernel

        Gauss(p1, p0)
      + Gauss(p3, p2) * Periodic(p4, p5, p6)
      + RQ(p7, p8, p9)
      + (Gauss(p11, p10) + White(p12))

    with the reference's exact parameter ordering (KernelUtils.h:43-89;
    note GaussianKernel takes (sigma, scale) so p1/p0 etc. are swapped in
    the constructor calls, matching KernelUtils.h:73-84).  Tested by the
    reference's HighlyGeneralKernelTest."""
    params = list(params)
    if len(params) != 13:
        raise ValueError("Wrong number of arguments.")
    k1 = Gaussian(params[1], params[0])
    k2 = Product(Gaussian(params[3], params[2]), Periodic(params[4], params[5], params[6]))
    k3 = RationalQuadratic(params[7], params[8], params[9])
    k4 = Sum(Gaussian(params[11], params[10]), White(params[12]))
    return Sum(Sum(Sum(k1, k2), k3), k4)
