"""Special functions needed on-device.

JAX ships no modified Bessel K functions, which the physics needs for the
Maxwell-Juttner normalization (reference uses gsl_sf_bessel_Kn(2, 1/theta),
Src/electron.c:221,550).  We implement exponentially-scaled K0e/K1e with the
classical Abramowitz & Stegun 9.8.5-9.8.8 polynomial fits (|err| < 2e-7) and
build K2e from the standard recurrence K2 = K0 + (2/z) K1.
"""
from __future__ import annotations

import jax.numpy as jnp


def _poly(x, coeffs):
    r = jnp.zeros_like(x) + coeffs[0]
    for c in coeffs[1:]:
        r = r * x + c
    return r


def bessel_k0e(z):
    """exp(z) * K0(z), z > 0."""
    # small-z branch (z <= 2): K0 = -ln(z/2) I0 + poly(z^2/4)
    t = z * z / 4.0
    small_i0 = _poly(
        (z / 3.75) ** 2,
        [0.0045813, 0.0360768, 0.2659732, 1.2067492, 3.0899424, 3.5156229, 1.0],
    )
    small = (
        -jnp.log(jnp.maximum(z, jnp.finfo(z.dtype).tiny) / 2.0) * small_i0
        + _poly(
            t,
            [0.00000740, 0.00010750, 0.00262698, 0.03488590, 0.23069756, 0.42278420, -0.57721566],
        )
    ) * jnp.exp(z)
    # large-z branch (z > 2)
    u = 2.0 / z
    large = _poly(
        u,
        [0.00053208, -0.00251540, 0.00587872, -0.01062446, 0.02189568, -0.07832358, 1.25331414],
    ) / jnp.sqrt(z)
    return jnp.where(z <= 2.0, small, large)


def bessel_k1e(z):
    """exp(z) * K1(z), z > 0."""
    t = z * z / 4.0
    small_i1 = z * _poly(
        (z / 3.75) ** 2,
        [0.00032411, 0.00301532, 0.02658733, 0.15084934, 0.51498869, 0.87890594, 0.5],
    )
    small = (
        jnp.log(jnp.maximum(z, jnp.finfo(z.dtype).tiny) / 2.0) * small_i1
        + (1.0 / jnp.maximum(z, jnp.finfo(z.dtype).tiny))
        * _poly(
            t,
            [-0.00004686, -0.00110404, -0.01919402, -0.18156897, -0.67278579, 0.15443144, 1.0],
        )
    ) * jnp.exp(z)
    u = 2.0 / z
    large = _poly(
        u,
        [-0.00068245, 0.00325614, -0.00780353, 0.01504268, -0.03655620, 0.23498619, 1.25331414],
    ) / jnp.sqrt(z)
    return jnp.where(z <= 2.0, small, large)


def bessel_k2e(z):
    """exp(z) * K2(z) via the recurrence K2 = K0 + (2/z) K1."""
    return bessel_k0e(z) + (2.0 / z) * bessel_k1e(z)


def maxwell_juttner_pdf(gamma, theta):
    """Normalized Maxwell-Juttner distribution n(gamma) at dimensionless temp theta.

    Vectorized singleMaxwellJuttner (reference: Src/electron.c:538-560):
    uses K2(1/theta) exp(1/theta) for theta > 1e-2 and the small-theta limit
    sqrt(pi theta / 2) below.  Our K2e *is* the exponentially-scaled product, so
    both branches are numerically stable.
    """
    norm = jnp.where(
        theta > 1e-2,
        bessel_k2e(1.0 / theta),
        jnp.sqrt(jnp.pi * theta / 2.0),
    )
    g2 = gamma * gamma
    return (
        gamma
        * jnp.sqrt(jnp.maximum(g2 - 1.0, 0.0))
        / (theta * norm)
        * jnp.exp(-(gamma - 1.0) / theta)
    )
