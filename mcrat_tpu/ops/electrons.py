"""Batched electron sampling.

TPU-native re-design of the reference electron module (Src/electron.c):
thermal Maxwell-Juttner / low-temperature Maxwell-Boltzmann draws, the relative
polar-angle inverse CDF, the rotation into the photon's frame, and the
non-thermal power-law / broken-power-law inverse-CDF samplers.

Electron four-momenta are dimensionless (units of m_e c): el_p0 = gamma,
|el_p| = gamma beta.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import KB_OVER_MEC2, C_LIGHT, K_B, M_EL
from .fourvec import rotate_about_x, rotate_about_y
from .rng import batched_rejection, uniform_pos
from .special import bessel_k2e

# Temperature threshold between relativistic MJ rejection sampling and the
# three-Gaussian non-relativistic draw (reference: Src/electron.c:207,227).
T_RELATIVISTIC = 1e7


def sample_thermal_gamma(key, temp, max_iters: int = 24):
    """Sample electron Lorentz factors from a thermal distribution at ``temp`` [K].

    Vectorized sampleThermalElectron (reference: Src/electron.c:202-237).
    T >= 1e7 K: rejection sampling of gamma^2 beta exp(-gamma/theta)/K2(1/theta)
    with proposals uniform on (0, 1 + 100 theta) and envelope 1/2.
    T < 1e7 K: gamma from three Gaussian velocity components with sigma =
    sqrt(k T / m_e).
    """
    dtype = temp.dtype
    shape = temp.shape
    theta = KB_OVER_MEC2 * temp
    k_rel, k_gauss = jax.random.split(key)

    # --- relativistic branch (rejection) ---------------------------------------
    k2e = bessel_k2e(1.0 / jnp.maximum(theta, 1e-10))

    def propose2(k):
        k1, k2 = jax.random.split(k)
        x = uniform_pos(k1, shape, dtype) * (1.0 + 100.0 * theta)
        y = jax.random.uniform(k2, shape, dtype=dtype) / 2.0
        return (x, y)

    # Lanes on the non-relativistic branch auto-accept so batched lanes with
    # cold cells cannot stall the whole-population rejection loop (their value
    # is replaced by the Gaussian draw below anyway).
    nonrel = temp < T_RELATIVISTIC

    def accept2(x, y):
        # x < 1 would give beta = nan in the reference; those proposals are
        # rejected there via the isnan check (Src/electron.c:214).
        valid = x > 1.0
        beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (x * x), 1e-30))
        # f = x^2 beta exp(-(x-1)/theta)/K2e(1/theta): exactly the reference's
        # x^2 beta exp(-x/theta)/K2(1/theta), written in overflow-safe form.
        f = x * x * beta * jnp.exp(-(x - 1.0) / theta) / k2e
        return nonrel | (valid & (y < f))

    (gamma_rel, _y) = batched_rejection(
        k_rel,
        shape,
        propose2,
        accept2,
        init=(jnp.ones(shape, dtype) + theta, jnp.zeros(shape, dtype)),
        max_iters=max_iters,
    )

    # --- non-relativistic branch -----------------------------------------------
    sigma = jnp.sqrt(K_B * temp / M_EL) / C_LIGHT
    v = jax.random.normal(k_gauss, shape + (3,), dtype=dtype) * sigma[..., None]
    v2 = jnp.sum(v * v, axis=-1)
    gamma_gauss = 1.0 / jnp.sqrt(jnp.maximum(1.0 - v2, 1e-30))

    return jnp.where(temp >= T_RELATIVISTIC, gamma_rel, gamma_gauss)


def sample_electron_theta(key, beta):
    """Relative polar angle between electron and photon.

    Inverse CDF of (1 - beta cos t) sin t (vectorized from reference
    Src/electron.c:196, RAIKOU eq. 56):
        theta = acos((1 - sqrt(1 + beta^2 + 2 beta - 4 beta u)) / beta)
    with the beta -> 0 limit cos(theta) = 2u - 1.
    """
    u = jax.random.uniform(key, beta.shape, dtype=beta.dtype)
    safe_beta = jnp.maximum(beta, 1e-8)
    arg = 1.0 + safe_beta * safe_beta + 2.0 * safe_beta - 4.0 * safe_beta * u
    cos_t = (1.0 - jnp.sqrt(jnp.maximum(arg, 0.0))) / safe_beta
    cos_t = jnp.where(beta < 1e-6, 2.0 * u - 1.0, cos_t)
    return jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))


def rotate_electron_to_photon_frame(el_p, ph_p):
    """Rotate sampled electron momenta into each photon's axes.

    Vectorized rotateElectron (reference: Src/electron.c:126-175).  The sampled
    electron direction treats the photon as the polar axis with components
    ordered (E, p cos t, p sin t sin phi, p sin t cos phi); the reference's
    photon angles are computed as phi = atan2(p2, p3), theta =
    atan2(sqrt(p2^2+p3^2), p1), then the spatial part is rotated about y by
    theta and about x by -phi.
    """
    ph_phi = jnp.arctan2(ph_p[..., 2], ph_p[..., 3])
    ph_theta = jnp.arctan2(
        jnp.sqrt(ph_p[..., 2] ** 2 + ph_p[..., 3] ** 2), ph_p[..., 1]
    )
    v = el_p[..., 1:]
    v = rotate_about_y(v, ph_theta)
    v = rotate_about_x(v, -ph_phi)
    return jnp.concatenate([el_p[..., :1], v], axis=-1)


def sample_thermal_electron(key, temp, ph_p):
    """Full thermal electron draw aligned to each photon.

    Vectorized singleThermalElectron (reference: Src/electron.c:70-94).
    ``temp`` is (N,) cell temperature [K]; ``ph_p`` the (N, 4) comoving photon
    four-momentum (dimensionless units are fine — only the direction is used).
    Returns (N, 4) electron four-momentum in units of m_e c.
    """
    k_g, k_phi, k_th = jax.random.split(key, 3)
    gamma = sample_thermal_gamma(k_g, temp)
    beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (gamma * gamma), 0.0))
    phi = jax.random.uniform(k_phi, temp.shape, dtype=temp.dtype, maxval=2.0 * jnp.pi)
    theta = sample_electron_theta(k_th, beta)
    gb = gamma * beta
    el_p = jnp.stack(
        [
            gamma,
            gb * jnp.cos(theta),
            gb * jnp.sin(theta) * jnp.sin(phi),
            gb * jnp.sin(theta) * jnp.cos(phi),
        ],
        axis=-1,
    )
    return rotate_electron_to_photon_frame(el_p, ph_p)


# ----------------------------------------------------------------------------
# Non-thermal distributions (reference: Src/electron.c:253-332, 334-536)
# ----------------------------------------------------------------------------

def sample_power_law(key, shape, dtype, p, gamma_min, gamma_max):
    """Inverse-CDF power-law sampler n(g) ~ g^-p on [gamma_min, gamma_max].

    Vectorized samplePowerLaw (reference: Src/electron.c:253-270) including the
    p -> 1 limit.
    """
    u = uniform_pos(key, shape, dtype)
    if abs(p - 1.0) < 1e-6:
        return gamma_min * (gamma_max / gamma_min) ** u
    g = 1.0 + u * ((gamma_max / gamma_min) ** (1.0 - p) - 1.0)
    return gamma_min * g ** (1.0 / (1.0 - p))


def power_law_norm(p, gamma_min, gamma_max):
    """Normalization A of n(g) = A g^-p (reference: Src/electron.c:447-476)."""
    import math

    if abs(p - 1.0) < 1e-10:
        return 1.0 / math.log(gamma_max / gamma_min)
    return (1.0 - p) / (gamma_max ** (1.0 - p) - gamma_min ** (1.0 - p))


def broken_power_law_norm(p1, p2, gamma_min, gamma_max, gamma_break):
    """Normalization A of the broken power law (reference: Src/electron.c:334-371)."""
    import math

    p1_is_1 = abs(p1 - 1.0) < 1e-10
    p2_is_1 = abs(p2 - 1.0) < 1e-10
    if not p1_is_1 and not p2_is_1:
        t1 = (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
        t2 = gamma_break ** (p2 - p1) * (
            gamma_max ** (1 - p2) - gamma_break ** (1 - p2)
        ) / (1 - p2)
    elif p1_is_1 and not p2_is_1:
        t1 = math.log(gamma_break / gamma_min)
        t2 = gamma_break ** (p2 - 1.0) * (
            gamma_max ** (1 - p2) - gamma_break ** (1 - p2)
        ) / (1 - p2)
    elif not p1_is_1 and p2_is_1:
        t1 = (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
        t2 = gamma_break ** (1 - p1) * math.log(gamma_max / gamma_break)
    else:
        return 0.0
    return 1.0 / (t1 + t2)


def power_law_pdf(g, p, gamma_min, gamma_max):
    """n(g) = A g^-p inside the range, 0 outside (reference: electron.c:479-504)."""
    a = power_law_norm(p, gamma_min, gamma_max)
    val = a * g ** (-p)
    return jnp.where((g >= gamma_min) & (g <= gamma_max), val, 0.0)


def broken_power_law_pdf(g, p1, p2, gamma_min, gamma_max, gamma_break):
    """Broken power law with continuity factor (reference: electron.c:374-406)."""
    a = broken_power_law_norm(p1, p2, gamma_min, gamma_max, gamma_break)
    cont = gamma_break ** (p2 - p1)
    val = jnp.where(g <= gamma_break, a * g ** (-p1), a * cont * g ** (-p2))
    return jnp.where((g >= gamma_min) & (g <= gamma_max), val, 0.0)


def sample_broken_power_law(key, shape, dtype, p1, p2, gamma_min, gamma_max, gamma_break):
    """Inverse-CDF broken-power-law sampler.

    Vectorized sampleBrokenPowerLaw (reference: Src/electron.c:272-332),
    including the reference's sign correction for the g > gamma_break branch
    (comment at electron.c:289-292) and both p -> 1 limits.
    """
    import math

    u = uniform_pos(key, shape, dtype)
    p1_is_1 = abs(p1 - 1.0) < 1e-6
    p2_is_1 = abs(p2 - 1.0) < 1e-6
    if not p1_is_1 and not p2_is_1:
        a = 1.0 / (
            (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
            + gamma_break ** (p2 - p1)
            * (gamma_max ** (1 - p2) - gamma_break ** (1 - p2))
            / (1 - p2)
        )
        xi_break = a * (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
        g_lo = (gamma_min ** (1 - p1) + (1 - p1) * u / a) ** (1.0 / (1 - p1))
        g_hi = (
            gamma_break ** (1 - p2)
            + (1 - p2)
            * gamma_break ** (p1 - p2)
            * ((gamma_min ** (1 - p1) - gamma_break ** (1 - p1)) / (1 - p1) + u / a)
        ) ** (1.0 / (1 - p2))
    elif p1_is_1 and not p2_is_1:
        a = 1.0 / (
            math.log(gamma_break / gamma_min)
            + gamma_break ** (p2 - p1)
            * (gamma_max ** (1 - p2) - gamma_break ** (1 - p2))
            / (1 - p2)
        )
        xi_break = a * math.log(gamma_break / gamma_min)
        g_lo = gamma_min * jnp.exp(u / a)
        g_hi = (
            gamma_break ** (1 - p2)
            - (1 - p2)
            * gamma_break ** (p1 - p2)
            * (math.log(gamma_break / gamma_min) - u / a)
        ) ** (1.0 / (1 - p2))
    elif not p1_is_1 and p2_is_1:
        a = 1.0 / (
            (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
            + gamma_break ** (p2 - p1) * math.log(gamma_max / gamma_break)
        )
        xi_break = a * (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1)
        g_lo = (gamma_min ** (1 - p1) + (1 - p1) * u / a) ** (1.0 / (1 - p1))
        g_hi = gamma_break * jnp.exp(
            gamma_break ** (p1 - p2)
            * (u / a - (gamma_break ** (1 - p1) - gamma_min ** (1 - p1)) / (1 - p1))
        )
    else:
        raise ValueError("p1 == p2 == 1 broken power law is not supported")
    return jnp.where(u <= xi_break, g_lo, g_hi)


def norm_power_law_energy_dens(p, gamma_min, gamma_max):
    """<gamma m c^2> per electron for a power law (reference: electron.c:581-605)."""
    import math

    from ..constants import ME_C2

    if abs(p - 2.0) < 1e-10:
        r = math.log(gamma_max / gamma_min)
    else:
        r = (gamma_max ** (2.0 - p) - gamma_min ** (2.0 - p)) / (2.0 - p)
    return r * power_law_norm(p, gamma_min, gamma_max) * ME_C2


def norm_broken_power_law_energy_dens(p1, p2, gamma_min, gamma_max, gamma_break):
    """<gamma m c^2> per electron, broken power law (reference: electron.c:607-652)."""
    import math

    from ..constants import ME_C2

    p1_is_2 = abs(p1 - 2.0) < 1e-10
    p2_is_2 = abs(p2 - 2.0) < 1e-10
    if not p1_is_2 and not p2_is_2:
        t1 = (gamma_break ** (2 - p1) - gamma_min ** (2 - p1)) / (2 - p1)
        t2 = gamma_break ** (p2 - p1) * (
            gamma_max ** (2 - p2) - gamma_break ** (2 - p2)
        ) / (2 - p2)
        r = t1 + t2
    elif p1_is_2 and not p2_is_2:
        t1 = math.log(gamma_break / gamma_min)
        t2 = gamma_break ** (p2 - 2.0) * (
            gamma_max ** (2 - p2) - gamma_break ** (2 - p2)
        ) / (2 - p2)
        r = t1 + t2
    elif not p1_is_2 and p2_is_2:
        t1 = (gamma_break ** (2 - p1) - gamma_min ** (2 - p1)) / (2 - p1)
        t2 = gamma_break ** (2 - p1) * math.log(gamma_max / gamma_break)
        r = t1 + t2
    else:
        r = 0.0
    return r * broken_power_law_norm(p1, p2, gamma_min, gamma_max, gamma_break) * ME_C2


def power_law_cdf(g, p, gamma_min, gamma_max):
    """CDF of the normalized power law on [gamma_min, gamma_max]."""
    a = power_law_norm(p, gamma_min, gamma_max)
    if abs(p - 1.0) < 1e-10:
        return a * jnp.log(g / gamma_min)
    return a * (g ** (1.0 - p) - gamma_min ** (1.0 - p)) / (1.0 - p)


def broken_power_law_cdf(g, p1, p2, gamma_min, gamma_max, gamma_break):
    """Piecewise CDF of the normalized broken power law (continuity factor
    gamma_break^(p2-p1) above the break; reference pdf: electron.c:374-406)."""
    import math

    a = broken_power_law_norm(p1, p2, gamma_min, gamma_max, gamma_break)

    def seg(lo, hi, p):
        if abs(p - 1.0) < 1e-10:
            return jnp.log(hi / lo)
        return (hi ** (1.0 - p) - lo ** (1.0 - p)) / (1.0 - p)

    below = a * seg(gamma_min, jnp.minimum(g, gamma_break), p1)
    cont = gamma_break ** (p2 - p1)
    f_break = a * seg(gamma_min, gamma_break, p1)
    above = a * cont * seg(gamma_break, jnp.maximum(g, gamma_break), p2)
    return jnp.where(g <= gamma_break, below, f_break + above)


def sample_nonthermal_gamma_range(key, g_lo, g_hi, cfg):
    """Sample gamma from the configured nonthermal distribution restricted to
    per-lane subgroup ranges [g_lo, g_hi].

    Inverse-CDF on a remapped uniform: u' = F(g_lo) + u (F(g_hi) - F(g_lo)).
    NB: the reference's subgroup restriction is inert — its retry loop
    ``while (gamma < gmin && gamma > gmax)`` (Src/electron.c:102-105) can never
    trigger, so it samples the full distribution regardless of the chosen
    subgroup; this implementation restricts correctly.
    """
    from ..config import NonthermalDist

    dtype = g_lo.dtype
    u = uniform_pos(key, g_lo.shape, dtype)
    if cfg.nonthermal_e_dist is NonthermalDist.POWERLAW:
        f_lo = power_law_cdf(g_lo, cfg.powerlaw_index, cfg.gamma_min, cfg.gamma_max)
        f_hi = power_law_cdf(g_hi, cfg.powerlaw_index, cfg.gamma_min, cfg.gamma_max)
        up = f_lo + u * (f_hi - f_lo)
        p = cfg.powerlaw_index
        a = power_law_norm(p, cfg.gamma_min, cfg.gamma_max)
        if abs(p - 1.0) < 1e-6:
            return cfg.gamma_min * jnp.exp(up / a)
        return (cfg.gamma_min ** (1.0 - p) + (1.0 - p) * up / a) ** (1.0 / (1.0 - p))
    # broken power law: remap u then reuse the full inverse sampler formulas
    f_lo = broken_power_law_cdf(
        g_lo, cfg.powerlaw_index_1, cfg.powerlaw_index_2,
        cfg.gamma_min, cfg.gamma_max, cfg.gamma_break,
    )
    f_hi = broken_power_law_cdf(
        g_hi, cfg.powerlaw_index_1, cfg.powerlaw_index_2,
        cfg.gamma_min, cfg.gamma_max, cfg.gamma_break,
    )
    up = f_lo + u * (f_hi - f_lo)
    return _broken_power_law_inverse(up, cfg)


def _broken_power_law_inverse(u, cfg):
    """Inverse CDF of the broken power law at quantiles ``u`` (traced array)."""
    p1, p2 = cfg.powerlaw_index_1, cfg.powerlaw_index_2
    gmin, gmax, gbrk = cfg.gamma_min, cfg.gamma_max, cfg.gamma_break
    a = broken_power_law_norm(p1, p2, gmin, gmax, gbrk)
    import math

    def seg_int(lo, hi, p):
        if abs(p - 1.0) < 1e-10:
            return math.log(hi / lo)
        return (hi ** (1.0 - p) - lo ** (1.0 - p)) / (1.0 - p)

    f_break = a * seg_int(gmin, gbrk, p1)
    cont = gbrk ** (p2 - p1)
    # below-break inverse
    if abs(p1 - 1.0) < 1e-6:
        g_lo = gmin * jnp.exp(u / a)
    else:
        g_lo = (gmin ** (1.0 - p1) + (1.0 - p1) * u / a) ** (1.0 / (1.0 - p1))
    # above-break inverse
    u2 = (u - f_break) / (a * cont)
    if abs(p2 - 1.0) < 1e-6:
        g_hi = gbrk * jnp.exp(u2)
    else:
        g_hi = (gbrk ** (1.0 - p2) + (1.0 - p2) * u2) ** (1.0 / (1.0 - p2))
    return jnp.where(u <= f_break, g_lo, g_hi)


def sample_nonthermal_electron(key, subgroup, ph_p, cfg):
    """Nonthermal electron draw aligned to each photon, restricted to the
    chosen gamma subgroup (1-based index; reference: singleNonThermalElectron,
    Src/electron.c:96-124 and the subgroup-interval math at :55-62)."""
    import math

    k_g, k_phi, k_th = jax.random.split(key, 3)
    dtype = ph_p.dtype
    dg = (math.log10(cfg.gamma_max) - math.log10(cfg.gamma_min)) / cfg.n_gamma
    lg_lo = math.log10(cfg.gamma_min) + (subgroup - 1).astype(dtype) * dg
    g_lo = 10.0 ** lg_lo
    g_hi = 10.0 ** (lg_lo + dg)
    gamma = sample_nonthermal_gamma_range(k_g, g_lo, g_hi, cfg)
    beta = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (gamma * gamma), 0.0))
    phi = jax.random.uniform(k_phi, gamma.shape, dtype=dtype, maxval=2.0 * jnp.pi)
    theta = sample_electron_theta(k_th, beta)
    gb = gamma * beta
    el_p = jnp.stack(
        [gamma, gb * jnp.cos(theta), gb * jnp.sin(theta) * jnp.sin(phi),
         gb * jnp.sin(theta) * jnp.cos(phi)],
        axis=-1,
    )
    return rotate_electron_to_photon_frame(el_p, ph_p)
