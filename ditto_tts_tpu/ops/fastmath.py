"""Cheap transcendental approximations for Pallas kernel bodies.

Mosaic lowers ``jnp.sin`` through a full-range reduction that measured
~half of the fused anti-aliased-Snake kernel's runtime on v5e (r5 probe:
3.41 -> 1.76 ms/call with the sin removed, C=192 pair).  Snake only needs
``sin^2(a*x)`` — which is pi-periodic — so a two-constant Cody-Waite
reduction plus a short odd polynomial reproduces it to ~1e-8 absolute at
a tenth of the instruction count.

Accuracy (measured, tests/test_fastmath.py): the polynomial is a true
minimax fit (|sin err| < 3.4e-9 in f64); evaluated in fp32 the arithmetic
noise dominates and |sin2(x) - sin^2(x_fp32)| <= ~5e-7 for |x| <~ 1e3
(beyond that the fp32 ulp of x itself dominates both this and the exact
lowering).  The strict-parity oracle paths (ops/snake.py) keep
``jnp.sin``.
"""

from __future__ import annotations

import jax.numpy as jnp

_INV_PI = 0.3183098861837907
# pi split so n * _PI_HI is exact for |n| < 2^15 (hi has 9 trailing
# zero bits in its fp32 mantissa)
_PI_HI = 3.140625
_PI_LO = 0.0009676535897932384
# sin(f), f in [-pi/2, pi/2]: f * (c0 + c1 f^2 + c2 f^4 + c3 f^6 + c4 f^8)
# (iteratively-reweighted minimax fit on Chebyshev nodes; |sin err| <
# 3.4e-9 in f64 — r5 refit: the original coefficients equioscillated on
# a narrower interval and leaked ~5e-6 near |f| = pi/2)
_C0 = 0.999999977
_C1 = -0.166666476
_C2 = 0.00833289979
_C3 = -0.000198008956
_C4 = 2.59048416e-06


def sin2(x):
    """sin(x)^2 via pi-periodic range reduction; fp32 in, fp32 out."""
    n = jnp.round(x * _INV_PI)
    f = x - n * _PI_HI - n * _PI_LO          # f in [-pi/2, pi/2]
    f2 = f * f
    s = f * (_C0 + f2 * (_C1 + f2 * (_C2 + f2 * (_C3 + f2 * _C4))))
    return s * s
