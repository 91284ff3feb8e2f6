"""Fused transport-round Pallas kernel.

The XLA transport round (transport.transport_rounds) is memory-bound, not
compute-bound: a `lax.while_loop` iteration materializes its carry and every
fusion boundary's intermediates to HBM, which measures ~10 KB of traffic per
photon-round — ~50x the photon's actual state.  This kernel runs K complete
transport rounds per invocation with ALL state resident in VMEM:

    tau-rate -> comoving boost -> free path -> move -> KN scatter -> Stokes

The containing-cell search and packed-row gather stay OUTSIDE the kernel (the
tunnel's Mosaic compiler has no reliable per-lane dynamic gather): a photon
whose post-move position leaves its cached cell simply *stalls* — it stops
participating in later in-kernel rounds and the XLA caller re-gathers its row
via grid.find_cell_rows before the next invocation.  A scatter always uses the
pre-move cell's properties, exactly like the XLA path (and the reference,
which samples each free path from the starting cell and never stops photons at
cell boundaries: Src/mclib.c:617-714, 1054-1100).

Scope: thermal electrons with DIRECT tau (sigma_hat = 1) run fully in-kernel;
TABLE-mode hot cross sections and nonthermal electron populations are ALSO
covered via two auxiliary per-lane planes computed by XLA at each invocation
boundary (the biased total tau-rate coefficient and the thermal selection
probability — both functions of the photon's comoving energy and its cell
only).  Those quantities change exactly when the photon scatters (new eps')
or changes cell, so in aux mode a lane STALLS after its first scatter — the
same protocol as the cell-exit stall — and the XLA caller refreshes the
planes before the next invocation.  No approximation is involved.
Physics is a component-form transcription of ops.{fourvec,stokes,electrons,
compton} — every formula cites its batched twin, and
tests/test_pallas_round.py checks the two paths agree in distribution.

Randomness is the per-core hardware PRNG (pltpu.prng_*), seeded per
(block, invocation); the samplers draw the same trial counts as the XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, Dims, Geometry
from ..constants import C_LIGHT, KB_OVER_MEC2, M_P, THOM_X_SECT

# transport.DEFAULT_MFP duplicated to avoid a circular import
_DEFAULT_MFP = 1e12

LANES = 128

# state plane layout (f32): lab p, position, Stokes q/u/v (I == 1), frame time
# left, scatter count, comoving p
SP_P0, SP_P1, SP_P2, SP_P3 = 0, 1, 2, 3
SP_X, SP_Y, SP_Z = 4, 5, 6
SP_Q, SP_U, SP_V = 7, 8, 9
SP_TREM = 10
SP_NS = 11
SP_C0, SP_C1, SP_C2, SP_C3 = 12, 13, 14, 15
N_STATE = 16

# flags bit layout (int32)
FLAG_ALIVE = 1
FLAG_POOL = 2
FLAG_INGRID = 4
OUT_STALLED = 1
OUT_PROMOTED = 2

# aux plane layout (TABLE / nonthermal mode): per-lane quantities XLA
# recomputes at every invocation boundary (see module docstring)
AUX_NSIG = 0  # biased total tau-rate coefficient [1/cm] before (1 - beta mu)
AUX_PTH = 1  # probability the scattering electron is thermal
N_AUX = 2

# row plane indices — MUST match grid.PCOL
from ..grid import PCOL  # noqa: E402

_TINY = 1e-37  # float32 tiny-ish floor, matches jnp.finfo(f32).tiny scale


class _Rng:
    """In-kernel uniform source.

    On hardware it is the per-core TPU PRNG (pltpu.prng_*).  Interpret mode
    (CPU tests) has no lowering for those primitives, so it falls back to a
    counter-based murmur3-finalizer hash over (seed, call#, lane id) — a
    statistically adequate stand-in that keeps kernel and tests identical in
    structure.  Every uniform is a full (S, 128) draw either way.
    """

    def __init__(self, shape, interpret: bool):
        self.shape = shape
        self.interpret = interpret
        self._calls = 0
        self._base = None

    def seed(self, seed_scalar, pid):
        salt = pid * jnp.int32(1442695041)
        if self.interpret:
            lane = jax.lax.broadcasted_iota(jnp.int32, self.shape, 0) * self.shape[1]
            lane = lane + jax.lax.broadcasted_iota(jnp.int32, self.shape, 1)
            self._base = (
                (seed_scalar + salt).astype(jnp.uint32)
                + lane.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            )
        else:
            pltpu.prng_seed(seed_scalar + salt)

    def _bits(self):
        if self.interpret:
            self._calls += 1
            x = self._base + jnp.uint32((self._calls * 0x85EBCA6B) & 0xFFFFFFFF)
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x7FEB352D)
            x = x ^ (x >> 15)
            x = x * jnp.uint32(0x846CA68B)
            x = x ^ (x >> 16)
            return x
        return pltpu.bitcast(pltpu.prng_random_bits(self.shape), jnp.uint32)

    def uniform(self):
        bits = self._bits()
        mant = (bits >> 9) | jnp.uint32(0x3F800000)
        if self.interpret:
            return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0
        return pltpu.bitcast(mant, jnp.float32) - 1.0

    def uniform_pos(self):
        return jnp.maximum(self.uniform(), _TINY)


def _iterate(rng: "_Rng", n: int, body, init):
    """Run ``body(i, carry)`` n times.

    On hardware this is a ``lax.fori_loop`` — crucial for compile time: the
    rejection samplers draw ~44 trial blocks per round and unrolling them all
    made the Mosaic program minutes-long to compile.  The hardware PRNG is
    stateful, so iterations draw fresh randomness inside the loop.  Interpret
    mode (CPU tests) keeps the Python unroll because its counter-based RNG
    advances per *traced* call.
    """
    if rng.interpret:
        carry = init
        for i in range(n):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, n, body, init)


def _boost(bx, by, bz, p0, p1, p2, p3):
    """Photon Lorentz boost, component form of ops.fourvec.lorentz_boost
    (+ zero_norm)."""
    b2 = bx * bx + by * by + bz * bz
    safe_b2 = jnp.where(b2 > 0, b2, 1.0)
    gam = jax.lax.rsqrt(jnp.maximum(1.0 - b2, 1e-30))
    bdotp = bx * p1 + by * p2 + bz * p3
    p0n = gam * (p0 - bdotp)
    coef = (gam - 1.0) * bdotp / safe_b2 - gam * p0
    q1 = p1 + coef * bx
    q2 = p2 + coef * by
    q3 = p3 + coef * bz
    p0n = jnp.where(b2 > 0, p0n, p0)
    q1 = jnp.where(b2 > 0, q1, p1)
    q2 = jnp.where(b2 > 0, q2, p2)
    q3 = jnp.where(b2 > 0, q3, p3)
    # zero_norm: rescale the spatial part to the energy
    n = jnp.sqrt(q1 * q1 + q2 * q2 + q3 * q3)
    scale = jnp.where(n > 0, p0n / jnp.maximum(n, _TINY), 1.0)
    return p0n, q1 * scale, q2 * scale, q3 * scale


def _rotate_basis(vox, voy, voz, rox, roy, roz, vnx, vny, vnz, rnx, rny, rnz, q, u):
    """Component form of ops.stokes.rotate_basis_vectors."""
    ax = roy * voz - roz * voy
    ay = roz * vox - rox * voz
    az = rox * voy - roy * vox
    bx = rny * vnz - rnz * vny
    by = rnz * vnx - rnx * vnz
    bz = rnx * vny - rny * vnx
    dot_ab = ax * bx + ay * by + az * bz
    n2 = (ax * ax + ay * ay + az * az) * (bx * bx + by * by + bz * bz)
    d = jnp.clip(dot_ab * jax.lax.rsqrt(jnp.maximum(n2, _TINY)), -1.0, 1.0)
    d = jnp.where(n2 > 0, d, 0.0)
    # f = sign((A x v_old) . B)
    cx = ay * voz - az * voy
    cy = az * vox - ax * voz
    cz = ax * voy - ay * vox
    f = jnp.sign(cx * bx + cy * by + cz * bz)
    c2 = jnp.where(f == 0, 1.0, 2.0 * d * d - 1.0)
    s2 = -f * 2.0 * d * jnp.sqrt(jnp.maximum(1.0 - d * d, 0.0))
    return c2 * q - s2 * u, s2 * q + c2 * u


# NB: the z-basis round-trip helper this file used to carry
# (_stokes_rotation = rotate(v: z->boost ref) + rotate(w: boost ref -> z))
# was dissolved into the collapsed chain in _single_scatter / round_body —
# consecutive rotations about one photon direction compose additively, so
# the z-hat waypoints between boosts were pure cost (round-4 weak #6).


# theta = kT/(m_e c^2) at the reference's thermal-sampler switch temperature
# of 1e7 K (Src/electron.c:206,227): below it the reference draws three
# Maxwell-Boltzmann Gaussian velocity components instead of rejection-sampling
# Maxwell-Juttner.  At theta < 1.7e-3 the two distributions agree to O(theta)
# — beyond float32 statistical resolution — so the cheap draw is exact here.
_THETA_MB_SWITCH = 1.6863699656e-3


def _thermal_gamma_beta(rng, shape, temp, el_iters: int):
    """Thermal (gamma, gamma beta) draw — component form of
    ops.electrons.sample_thermal_gamma_beta (Maxwell-Juttner via the
    Gamma-mixture envelope).

    Blocks whose every lane is nonrelativistic (T < 1e7 K, the reference's own
    sampler switch, Src/electron.c:206-237) take a Maxwell-Boltzmann speed
    draw instead: beta^2 = theta * chi2_3 with chi2_3 ~ chi-squared(3) from
    3 uniforms (Gamma(1) + Gamma(1/2) decomposition) — one trial versus the
    MJ loop's ``el_iters`` five-uniform trials.
    """
    theta = jnp.maximum(KB_OVER_MEC2 * temp, _TINY)

    def mb_draw():
        u1 = rng.uniform_pos()
        u2 = rng.uniform_pos()
        u3 = rng.uniform()
        cosb = jnp.cos((2.0 * jnp.pi) * u3)
        chi2_3 = -2.0 * jnp.log(u1) - 2.0 * jnp.log(u2) * (cosb * cosb)
        b2 = jnp.minimum(theta * chi2_3, jnp.float32(0.999999))
        gamma = jax.lax.rsqrt(1.0 - b2)
        gb = gamma * jnp.sqrt(b2)
        return gamma, gb

    def mj_draw():
        sqrt_theta = jnp.sqrt(theta)
        m3 = 2.0 * theta * sqrt_theta
        inv_mass = 1.0 / (1.0 + m3)
        cum1 = 0.5 * inv_mass
        cum2 = inv_mass

        def mj_trial(_, carry):
            xi, done = carry
            u0 = rng.uniform_pos()
            u1 = rng.uniform_pos()
            u2 = rng.uniform_pos()
            um = rng.uniform()
            ua = rng.uniform()
            p2 = u0 * u1
            prod = jnp.where(um < cum1, u0, jnp.where(um < cum2, p2, p2 * u2))
            cand = -jnp.log(prod)
            a = theta * cand
            target = (1.0 + a) * jnp.sqrt(jnp.maximum(a * (2.0 + a), 0.0))
            envelope = sqrt_theta * (1.0 + cand) + 2.0 * (theta * theta) * (cand * cand)
            ok = ua * envelope <= target
            take = ok & (done == 0.0)
            xi = jnp.where(take, cand, xi)
            done = jnp.maximum(done, ok.astype(jnp.float32))
            return xi, done

        xi, _ = _iterate(
            rng, el_iters, mj_trial,
            (jnp.full(shape, 1.5, jnp.float32), jnp.zeros(shape, jnp.float32)),
        )
        a = theta * xi
        gamma = 1.0 + a
        gb = jnp.sqrt(jnp.maximum(a * (2.0 + a), 0.0))
        return gamma, gb

    all_cold = jnp.all(theta < _THETA_MB_SWITCH)
    return jax.lax.cond(all_cold, mb_draw, mj_draw)


def _electron_from_gamma(rng, gamma, gb, c0, c1, c2, c3):
    """Relative-angle draw + rotation into the photon's axes, shared by the
    thermal and nonthermal populations (component form of
    ops.electrons.{sample_electron_cos_theta, rotate_electron_to_photon_frame}).
    """
    beta = gb / gamma

    # relative polar angle: inverse CDF of (1 - beta cos t) sin t
    # (ops.electrons.sample_electron_cos_theta)
    uu = rng.uniform()
    safe_beta = jnp.maximum(beta, 1e-8)
    arg = 1.0 + safe_beta * safe_beta + 2.0 * safe_beta - 4.0 * safe_beta * uu
    cos_t = (1.0 - jnp.sqrt(jnp.maximum(arg, 0.0))) / safe_beta
    cos_t = jnp.where(beta < 1e-6, 2.0 * uu - 1.0, cos_t)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    uphi = rng.uniform()
    phi = uphi * (2.0 * jnp.pi)
    sp, cp = jnp.sin(phi), jnp.cos(phi)

    e1 = gb * cos_t
    e2 = gb * sin_t * sp
    e3 = gb * sin_t * cp

    # rotate into the photon's axes (ops.electrons.rotate_electron_to_photon_frame)
    rho2 = c2 * c2 + c3 * c3
    rho = jnp.sqrt(rho2)
    norm = jnp.sqrt(rho2 + c1 * c1)
    inv_norm = 1.0 / jnp.maximum(norm, _TINY)
    c_th = c1 * inv_norm
    s_th = rho * inv_norm
    safe_rho = jnp.maximum(rho, _TINY)
    c_ph = jnp.where(rho > 0, c3 / safe_rho, 1.0)
    s_ph = jnp.where(rho > 0, c2 / safe_rho, 0.0)
    # rotate_about_y_cs(v, c_th, s_th): x' = c x - s z ; z' = s x + c z
    vx = c_th * e1 - s_th * e3
    vy = e2
    vz = s_th * e1 + c_th * e3
    # rotate_about_x_cs(v, c_ph, -s_ph): y' = c y + s z ; z' = -s y + c z
    wy = c_ph * vy + s_ph * vz
    wz = -s_ph * vy + c_ph * vz
    return gamma, vx, wy, wz


def _make_nonthermal_gamma(cfg: Config):
    """Build the in-kernel nonthermal gamma sampler for a static config.

    Component form of ops.electrons.sample_nonthermal_gamma_range: inverse-CDF
    of the configured power law / broken power law restricted to the lane's
    gamma subgroup (subgroup_f is the float 0-based subgroup index).  All
    distribution constants are Python floats baked into the kernel.
    """
    import math

    from ..config import NonthermalDist

    lg_min = math.log10(cfg.gamma_min)
    lg_max = math.log10(cfg.gamma_max)
    dg = (lg_max - lg_min) / cfg.n_gamma
    LN10 = math.log(10.0)

    if cfg.nonthermal_e_dist is NonthermalDist.POWERLAW:
        p = cfg.powerlaw_index
        p_is_1 = abs(p - 1.0) < 1e-6
        q = 1.0 - p

        def sample(rng, subgroup_f):
            u = rng.uniform()
            ln_lo = LN10 * (lg_min + subgroup_f * dg)
            ln_hi = ln_lo + LN10 * dg
            if p_is_1:
                # gamma = g_lo (g_hi/g_lo)^u
                return jnp.exp(ln_lo + u * (ln_hi - ln_lo))
            # gamma^q uniform between the subgroup edges' q-powers
            a = jnp.exp(q * ln_lo)
            b = jnp.exp(q * ln_hi)
            return jnp.exp((1.0 / q) * jnp.log(jnp.maximum(a + u * (b - a), _TINY)))

        return sample

    # broken power law: remap u through the piecewise CDF
    p1, p2 = cfg.powerlaw_index_1, cfg.powerlaw_index_2
    gmin, gmax, gbrk = cfg.gamma_min, cfg.gamma_max, cfg.gamma_break
    from .electrons import broken_power_law_norm

    a_norm = broken_power_law_norm(p1, p2, gmin, gmax, gbrk)
    cont = gbrk ** (p2 - p1)
    p1_is_1 = abs(p1 - 1.0) < 1e-6
    p2_is_1 = abs(p2 - 1.0) < 1e-6

    def seg1(hi):  # integral of g^-p1 from gmin to hi (hi traced)
        if p1_is_1:
            return jnp.log(hi / gmin)
        return (jnp.exp((1.0 - p1) * jnp.log(hi)) - gmin ** (1.0 - p1)) / (1.0 - p1)

    def seg2(hi):  # integral of g^-p2 from gbrk to hi
        if p2_is_1:
            return jnp.log(hi / gbrk)
        return (jnp.exp((1.0 - p2) * jnp.log(hi)) - gbrk ** (1.0 - p2)) / (1.0 - p2)

    f_break = a_norm * (
        math.log(gbrk / gmin) if p1_is_1
        else (gbrk ** (1.0 - p1) - gmin ** (1.0 - p1)) / (1.0 - p1)
    )

    def cdf(g):
        below = a_norm * seg1(jnp.minimum(g, gbrk))
        above = f_break + a_norm * cont * seg2(jnp.maximum(g, gbrk))
        return jnp.where(g <= gbrk, below, above)

    def inv(u):
        if p1_is_1:
            g_lo = gmin * jnp.exp(u / a_norm)
        else:
            arg = gmin ** (1.0 - p1) + (1.0 - p1) * u / a_norm
            g_lo = jnp.exp(jnp.log(jnp.maximum(arg, _TINY)) / (1.0 - p1))
        u2 = (u - f_break) / (a_norm * cont)
        if p2_is_1:
            g_hi = gbrk * jnp.exp(u2)
        else:
            arg2 = gbrk ** (1.0 - p2) + (1.0 - p2) * u2
            g_hi = jnp.exp(jnp.log(jnp.maximum(arg2, _TINY)) / (1.0 - p2))
        return jnp.where(u <= f_break, g_lo, g_hi)

    def sample(rng, subgroup_f):
        u = rng.uniform()
        g_lo = jnp.exp(LN10 * (lg_min + subgroup_f * dg))
        g_hi = jnp.exp(LN10 * (lg_min + (subgroup_f + 1.0) * dg))
        f_lo = cdf(g_lo)
        f_hi = cdf(g_hi)
        return inv(f_lo + u * (f_hi - f_lo))

    return sample


def _kn_cross_section(e):
    safe_e = jnp.maximum(e, 1e-10)
    full = 0.75 * (
        2.0 / (safe_e * safe_e)
        + (1.0 / (2.0 * safe_e) - (1.0 + safe_e) / (safe_e**3)) * jnp.log1p(2.0 * safe_e)
        + (1.0 + safe_e) / ((1.0 + 2.0 * safe_e) ** 2)
    )
    return jnp.where(e >= 1e-3, full, 1.0 - 2.0 * e)


def _sample_kn_angles(rng, shape, e0, q, u, stokes_on: bool, kn_iters: int):
    """Component form of ops.compton.sample_kn_angles_cs."""
    # theta: rejection of f(c) under envelope 2
    def theta_trial(_, carry):
        cos_theta, done = carry
        c = 2.0 * rng.uniform() - 1.0
        y = 2.0 * rng.uniform()
        m = 1.0 + e0 * (1.0 - c)
        f = (e0 * (1.0 - c) + 1.0 / m + c * c) / (m * m)
        ok = y < f
        take = ok & (done == 0.0)
        cos_theta = jnp.where(take, c, cos_theta)
        done = jnp.maximum(done, ok.astype(jnp.float32))
        return cos_theta, done

    cos_theta, _ = _iterate(
        rng, kn_iters, theta_trial,
        (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)),
    )
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))

    if stokes_on:
        mu = 1.0 + e0 * (1.0 - cos_theta)
        inv_mu = 1.0 / mu
        f_theta = (inv_mu + inv_mu**3 - (sin_theta * sin_theta) * inv_mu * inv_mu) * sin_theta
        pol_amp = sin_theta**3 * inv_mu * inv_mu
        # cos/sin of 2 phi_max = |atan2(-u, q)| straight from components
        # (Mosaic has no atan2): cos|x| = q/|qu|, sin|x| = |u|/|qu|
        norm_qu = jnp.sqrt(q * q + u * u)
        safe_qu = jnp.maximum(norm_qu, _TINY)
        cos2pm = q / safe_qu
        sin2pm = jnp.abs(u) / safe_qu
        norm = f_theta + pol_amp * (q * cos2pm - u * sin2pm)
        unpolarized = (q == 0.0) & (u == 0.0)
        safe_norm = jnp.where(norm != 0, norm, 1.0)

    def phi_trial(_, carry):
        x_acc, y_acc, done = carry
        x = 2.0 * rng.uniform() - 1.0
        y = 2.0 * rng.uniform() - 1.0
        r2 = x * x + y * y
        in_disk = (r2 <= 1.0) & (r2 > _TINY)
        if stokes_on:
            safe_r2 = jnp.maximum(r2, _TINY)
            c2 = (x * x - y * y) / safe_r2
            s2 = (2.0 * x * y) / safe_r2
            f = (f_theta + pol_amp * (q * c2 - u * s2)) / safe_norm
            ok = in_disk & (unpolarized | (r2 < f))
        else:
            ok = in_disk
        take = ok & (done == 0.0)
        x_acc = jnp.where(take, x, x_acc)
        y_acc = jnp.where(take, y, y_acc)
        done = jnp.maximum(done, ok.astype(jnp.float32))
        return x_acc, y_acc, done

    x_acc, y_acc, _ = _iterate(
        rng, kn_iters, phi_trial,
        (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
         jnp.zeros(shape, jnp.float32)),
    )
    inv_r = jax.lax.rsqrt(jnp.maximum(x_acc * x_acc + y_acc * y_acc, _TINY))
    return cos_theta, sin_theta, x_acc * inv_r, y_acc * inv_r


def _single_scatter(rng, shape, g0, e1x, e1y, e1z, c0, c1, c2, c3, q, u, v,
                    stokes_on: bool, kn_iters: int, fx=None, fy=None, fz=None):
    """Component form of ops.compton.single_scatter.

    (g0, e1*) is the electron four-momentum / m_e c; (c0..c3) the comoving
    photon four-momentum; (q, u, v) its Stokes vector.  Returns
    (scattered, new comoving p, new Stokes).

    Collapsed basis-rotation chain (round-4 weak #6 attempt): with the fluid
    boost direction (fx, fy, fz) given, q/u arrive in the FLUID-boost basis
    of c (the caller rotated lab z-basis(p) -> bf-basis(p) once) and leave in
    the (-electron-boost)-basis of the outgoing comoving direction o (the
    caller composes -be -> -bf -> z on the way back to the lab).  Same total
    rotation angle as the z-basis round-trips it replaces — 2-D (q, u)
    rotations about one photon direction compose additively — but 3 of the
    10 per-round _rotate_basis calls disappear.  The phi sampler's rest-frame
    z-ref convention (the alignment rotations are built about the z axis,
    matching the reference's kleinNishinaScatter phi measurement,
    Src/mcrat_scattering.c:544-584) pins the [be -> z about r] rotation, so
    the chain cannot collapse further.
    """
    inv_g = 1.0 / g0
    bx, by, bz = e1x * inv_g, e1y * inv_g, e1z * inv_g
    # boost into the electron rest frame
    r0, r1, r2, r3 = _boost(bx, by, bz, c0, c1, c2, c3)
    if stokes_on:
        # (bf -> be about c), transported by the boost, then (be -> z about
        # r) for the phi sampler — replaces the (bf -> z) + (z -> be) + full
        # _stokes_rotation chain
        q, u = _rotate_basis(c1, c2, c3, fx, fy, fz, c1, c2, c3, bx, by, bz, q, u)
        q, u = _rotate_basis(r1, r2, r3, bx, by, bz, r1, r2, r3, 0.0, 0.0, 1.0, q, u)

    e0 = r0
    # alignment rotation cosines/sines from components
    rho0 = jnp.sqrt(r1 * r1 + r2 * r2)
    has_xy = rho0 > 0
    safe_rho0 = jnp.maximum(rho0, _TINY)
    a_c0 = jnp.where(has_xy, r1 / safe_rho0, 1.0)
    a_s0 = jnp.where(has_xy, r2 / safe_rho0, 0.0)
    inv_e0 = jnp.where(e0 > 0, 1.0 / jnp.maximum(e0, _TINY), 0.0)
    a_c1 = jnp.where(e0 > 0, rho0 * inv_e0, 1.0)
    a_s1 = r3 * inv_e0

    accept_u = rng.uniform()
    scattered = accept_u <= _kn_cross_section(e0)

    ct, st, c_phi, s_phi = _sample_kn_angles(rng, shape, e0, q, u, stokes_on, kn_iters)

    e1 = e0 / (1.0 + e0 * (1.0 - ct))
    sx = e1 * ct
    sy = e1 * st * s_phi
    sz = e1 * st * c_phi
    # undo rotation about y: x' = c x - s z ; z' = s x + c z  (with c=a_c1, s=a_s1)
    tx = a_c1 * sx - a_s1 * sz
    tz = a_s1 * sx + a_c1 * sz
    # undo rotation about z: x' = c x - s y ; y' = s x + c y
    nx = a_c0 * tx - a_s0 * sy
    ny = a_s0 * tx + a_c0 * sy
    nz = tz

    if stokes_on:
        q2, u2 = _rotate_basis(r1, r2, r3, 0.0, 0.0, 1.0, nx, ny, nz, r1, r2, r3, q, u)
        cos_sc = (r1 * nx + r2 * ny + r3 * nz) / jnp.maximum(e0 * e1, _TINY)
        cos_sc = jnp.clip(cos_sc, -1.0, 1.0)
        # Fano matrix (ops.stokes.fano_scatter_stokes)
        st2 = jnp.maximum(1.0 - cos_sc * cos_sc, 0.0)
        de = e0 - e1
        m00 = 1.0 + cos_sc * cos_sc + (1.0 - cos_sc) * de
        m01 = st2
        m11 = 1.0 + cos_sc * cos_sc
        m22 = 2.0 * cos_sc
        m33 = 2.0 * cos_sc + cos_sc * (1.0 - cos_sc) * de
        fi = m00 + m01 * q2
        fq = m01 + m11 * q2
        fu = m22 * u2
        fv = m33 * v
        inv_i = 1.0 / fi
        q2, u2, v2 = fq * inv_i, fu * inv_i, fv * inv_i
        # (scattering plane -> -be about n): the -be basis rides the de-boost
        # to o; the caller finishes -be -> -bf -> z (collapsed chain)
        q2, u2 = _rotate_basis(nx, ny, nz, r1, r2, r3, nx, ny, nz, -bx, -by, -bz, q2, u2)
    else:
        q2, u2, v2 = q, u, v

    # de-boost to the comoving frame
    o0, o1, o2, o3 = _boost(-bx, -by, -bz, e1, nx, ny, nz)
    return scattered, o0, o1, o2, o3, q2, u2, v2


def _make_kernel(cfg: Config, stokes_on: bool, inner_rounds: int,
                 el_iters: int, kn_iters: int, s_rows: int, interpret: bool,
                 use_aux: bool, nonthermal: bool, slim: bool = False,
                 cheb_base: int = 0, nt_sub1: tuple = None,
                 ultra: bool = False):
    """Build the fused-round kernel body for a static config.

    ``slim`` selects the 8-row grid.PCOL_SLIM property layout (2-D
    cartesian/cylindrical, no phi-hat velocity): gamma and |beta| are then
    recomputed from (v0, v1) — two fused VPU ops — instead of being carried
    as packed rows, halving the per-invocation row gather and block IO.

    ``cheb_base`` > 0 enables in-kernel TABLE-mode hot cross sections: rows
    [cheb_base .. cheb_base + CHEB_ROWS - 1] carry the per-cell two-interval
    Chebyshev surrogate of log10 sigma_hat(eps') (ops.hot_xsec.
    thermal_cheb_cells: inv-knee row, linear-x low coefficients, log-space
    high coefficients) and the tau rate is rebuilt every round from the
    CURRENT comoving energy by a branch-select Clenshaw recurrence — no stall
    after scatters, unlike the legacy aux protocol (which remains for the
    carried/AMR path).
    """
    two_d = cfg.dims is not Dims.THREE
    geom = cfg.geometry
    dims = cfg.dims
    shape = (s_rows, LANES)
    nt_sample = _make_nonthermal_gamma(cfg) if nonthermal else None
    n_gamma = float(cfg.n_gamma)
    # fully-in-kernel nonthermal: the biased tau total and the thermal
    # selection probability are rebuilt per round from the per-cell thermal
    # surrogate rows + the GLOBAL subgroup-1 sigma_sub constants, so no aux
    # planes and no stall-on-scatter (ops.hot_xsec._sub1_cheb_static)
    nt_inkernel = nonthermal and cheb_base > 0 and nt_sub1 is not None
    if ultra:
        # uniform-rectilinear grids: per-cell GEOMETRY is computed from the
        # lane's cell-index bits (packed into the flags plane) and the grid
        # scalars appended to the SMEM dom vector, so the per-invocation
        # gather carries only the physics rows — 4 (2-D: v0, v1, ne_lab,
        # temp) or 5 (3-D cartesian: + v2) instead of slim's 8 / packed's 16.
        # gamma and |beta| are recomputed from the velocity components.
        assert not nonthermal and not use_aux
        if two_d:
            assert geom in (Geometry.CARTESIAN, Geometry.CYLINDRICAL,
                            Geometry.SPHERICAL)
            COL = dict(v0=0, v1=1, ne_lab=2, temp=3)
        else:
            assert geom is Geometry.CARTESIAN
            COL = dict(v0=0, v1=1, v2=2, ne_lab=3, temp=4)
    elif slim:
        from ..grid import PCOL_SLIM as COL
    else:
        COL = PCOL
    if slim and not ultra:
        assert two_d and geom in (Geometry.CARTESIAN, Geometry.CYLINDRICAL)
        assert not nonthermal, "nonthermal needs the full packed layout"

    def fluid_beta(row, px, py, ug=None):
        """grid.fluid_beta_from_rows, component form.  ``ug`` carries the
        ultra path's computed per-cell (sin theta_c, cos theta_c)."""
        v0 = row[COL["v0"]]
        v1 = row[COL["v1"]]
        if not two_d:
            return v0, v1, row[COL["v2"] if ultra else PCOL["v2"]]
        v2 = (
            row[PCOL["v2"]]
            if (dims is not Dims.TWO and not (slim or ultra))
            else jnp.zeros_like(v0)
        )
        rho = jnp.sqrt(px * px + py * py)
        has = rho > 0
        safe = jnp.where(has, rho, 1.0)
        c2 = jnp.where(has, px / safe, 1.0)
        s2 = jnp.where(has, py / safe, 0.0)
        if geom in (Geometry.CARTESIAN, Geometry.CYLINDRICAL):
            return v0 * c2 - v2 * s2, v0 * s2 + v2 * c2, v1
        if geom is Geometry.SPHERICAL:
            if ug is not None:
                s1, c1 = ug
            else:
                s1 = row[PCOL["sin1"]]
                c1 = row[PCOL["cos1"]]
            vr = v0 * s1 + v1 * c1
            return vr * c2 - v2 * s2, vr * s2 + v2 * c2, v0 * c1 - v1 * s1
        raise ValueError(f"unsupported geometry {geom}")

    def in_cell_and_domain(px, py, pz, row, dom_ref, cg=None):
        """Post-move membership: geometry.mcrat_to_hydro + checkInBlock + the
        strict domain test, arccos/atan2-free.

        Angular coordinates are tested in cosine space: for theta, c1 in
        [0, pi] and half-width h <= pi, |theta - c1| <= h iff
        cos(theta - c1) >= cos(h), with cos(theta - c1) expanded from the
        photon components and the packed sin1/cos1 cell cache (Mosaic has no
        inverse-trig lowering).  3-D spherical/polar (azimuthal cell widths)
        are excluded by fused_transport_available.
        """
        def phi_in(cphi, sphi, cos_c, sin_c, half_width):
            """|phi - c| <= h in cosine space: cos(phi - c) >= cos(h) with
            cos(phi - c) expanded from components (no atan2; also handles the
            0/2pi wrap that the raw AABB cannot)."""
            return cphi * cos_c + sphi * sin_c >= jnp.cos(half_width)

        def phi_components(px, py):
            rho = jnp.sqrt(px * px + py * py)
            has = rho > 0
            safe = jnp.where(has, rho, 1.0)
            return jnp.where(has, px / safe, 1.0), jnp.where(has, py / safe, 0.0)

        if dims is Dims.THREE:
            if geom is Geometry.CARTESIAN:
                h0, h1, h2 = px, py, pz
                if cg is not None:  # ultra: computed cell geometry
                    c0, c1, c2_, d0, d1, d2 = cg
                else:
                    c0, c1, c2_ = row[PCOL["r0"]], row[PCOL["r1"]], row[PCOL["r2"]]
                    d0, d1, d2 = row[PCOL["dr0"]], row[PCOL["dr1"]], row[PCOL["dr2"]]
                ok = (
                    (2.0 * jnp.abs(h0 - c0) - d0 <= 0)
                    & (2.0 * jnp.abs(h1 - c1) - d1 <= 0)
                    & (2.0 * jnp.abs(h2 - c2_) - d2 <= 0)
                    & (h0 > dom_ref[0]) & (h0 < dom_ref[1])
                    & (h1 > dom_ref[2]) & (h1 < dom_ref[3])
                    & (h2 > dom_ref[4]) & (h2 < dom_ref[5])
                )
                return ok
            if geom is Geometry.SPHERICAL:
                # (r, theta, phi): theta via the packed sin1/cos1 cache, phi
                # via the packed sin2/cos2 cache (reference membership:
                # Src/geometry.c:394-417 on mcratCoordinateToHydroCoordinate)
                rho = jnp.sqrt(px * px + py * py)
                r = jnp.sqrt(rho * rho + pz * pz)
                inv_r = 1.0 / jnp.maximum(r, _TINY)
                cos_th = jnp.clip(pz * inv_r, -1.0, 1.0)
                sin_th = rho * inv_r
                cos_dth = cos_th * row[PCOL["cos1"]] + sin_th * row[PCOL["sin1"]]
                in_theta = cos_dth >= jnp.cos(0.5 * row[PCOL["dr1"]])
                in_theta_dom = (cos_th < jnp.cos(dom_ref[2])) & (cos_th > jnp.cos(dom_ref[3]))
                cphi, sphi = phi_components(px, py)
                in_phi = phi_in(
                    cphi, sphi, row[PCOL["cos2"]], row[PCOL["sin2"]],
                    0.5 * row[PCOL["dr2"]],
                )
                # phi domain (d4, d5): cosine space around the interval center
                mid = 0.5 * (dom_ref[4] + dom_ref[5])
                half = 0.5 * (dom_ref[5] - dom_ref[4])
                in_phi_dom = phi_in(cphi, sphi, jnp.cos(mid), jnp.sin(mid), half)
                return (
                    (2.0 * jnp.abs(r - row[PCOL["r0"]]) - row[PCOL["dr0"]] <= 0)
                    & in_theta & in_theta_dom & in_phi & in_phi_dom
                    & (r > dom_ref[0]) & (r < dom_ref[1])
                )
            if geom is Geometry.POLAR:
                # (r_cyl, phi, z): phi is the r1 coordinate, so its trig cache
                # is the standard sin1/cos1 pair
                rho = jnp.sqrt(px * px + py * py)
                cphi, sphi = phi_components(px, py)
                in_phi = phi_in(
                    cphi, sphi, row[PCOL["cos1"]], row[PCOL["sin1"]],
                    0.5 * row[PCOL["dr1"]],
                )
                mid = 0.5 * (dom_ref[2] + dom_ref[3])
                half = 0.5 * (dom_ref[3] - dom_ref[2])
                in_phi_dom = phi_in(cphi, sphi, jnp.cos(mid), jnp.sin(mid), half)
                return (
                    (2.0 * jnp.abs(rho - row[PCOL["r0"]]) - row[PCOL["dr0"]] <= 0)
                    & in_phi & in_phi_dom
                    & (2.0 * jnp.abs(pz - row[PCOL["r2"]]) - row[PCOL["dr2"]] <= 0)
                    & (rho > dom_ref[0]) & (rho < dom_ref[1])
                    & (pz > dom_ref[4]) & (pz < dom_ref[5])
                )
            raise ValueError(f"unsupported 3-D geometry for fused kernel: {geom}")
        if geom in (Geometry.CARTESIAN, Geometry.CYLINDRICAL):
            h0 = jnp.sqrt(px * px + py * py)
            h1 = pz
            if cg is not None:  # ultra: computed cell geometry
                c0, c1, d0, d1 = cg
            else:
                c0, c1 = row[COL["r0"]], row[COL["r1"]]
                d0, d1 = row[COL["dr0"]], row[COL["dr1"]]
            return (
                (2.0 * jnp.abs(h0 - c0) - d0 <= 0)
                & (2.0 * jnp.abs(h1 - c1) - d1 <= 0)
                & (h0 > dom_ref[0]) & (h0 < dom_ref[1])
                & (h1 > dom_ref[2]) & (h1 < dom_ref[3])
            )
        if geom is Geometry.SPHERICAL:
            rho = jnp.sqrt(px * px + py * py)
            r = jnp.sqrt(rho * rho + pz * pz)
            inv_r = 1.0 / jnp.maximum(r, _TINY)
            cos_th = jnp.clip(pz * inv_r, -1.0, 1.0)
            sin_th = rho * inv_r
            if cg is not None:  # ultra: computed cell geometry + trig
                r_c, s1c, c1c, d0, cos_half_dth = cg
            else:
                r_c, d0 = row[PCOL["r0"]], row[PCOL["dr0"]]
                s1c, c1c = row[PCOL["sin1"]], row[PCOL["cos1"]]
                cos_half_dth = jnp.cos(0.5 * row[PCOL["dr1"]])
            # cos(theta - c1) = cos th cos c1 + sin th sin c1
            cos_dth = cos_th * c1c + sin_th * s1c
            in_theta = cos_dth >= cos_half_dth
            # domain: theta in (d2, d3) <=> cos d2 > cos th > cos d3
            in_theta_dom = (cos_th < jnp.cos(dom_ref[2])) & (cos_th > jnp.cos(dom_ref[3]))
            return (
                (2.0 * jnp.abs(r - r_c) - d0 <= 0)
                & in_theta & in_theta_dom
                & (r > dom_ref[0]) & (r < dom_ref[1])
            )
        raise ValueError(f"unsupported 2-D geometry for fused kernel: {geom}")

    def kernel(seed_ref, blkact_ref, dom_ref, state_ref, row_ref, flags_ref,
               *rest):
        if use_aux:
            aux_ref, state_out_ref, oflags_ref = rest
        else:
            aux_ref = None
            state_out_ref, oflags_ref = rest
        # blkact_ref[pid] != 0 marks a block with at least one active lane;
        # an all-idle block skips its compute and copies the state through
        # (the dominant cost of a frame's long tail, where a few deep photons
        # keep scattering long after the bulk is done).  Per-block flags —
        # rather than a leading-active-block count — let the caller skip the
        # row partition on most invocations: blocks that go idle between
        # partitions are skipped wherever they sit.
        # program_id must be read at kernel top level (interpret mode does
        # not substitute it inside pl.when sub-jaxprs).
        pid = pl.program_id(0)
        is_active_block = blkact_ref[pid] != 0

        @pl.when(jnp.logical_not(is_active_block))
        def _passthrough():
            for i in range(N_STATE):
                state_out_ref[i] = state_ref[i]
            oflags_ref[0] = jnp.zeros(shape, jnp.int32)

        @pl.when(is_active_block)
        def _active_body():
            _kernel_body(pid, seed_ref, dom_ref, state_ref, row_ref,
                         flags_ref, aux_ref, state_out_ref, oflags_ref)

    def _kernel_body(pid, seed_ref, dom_ref, state_ref, row_ref, flags_ref,
                     aux_ref, state_out_ref, oflags_ref):
        rng = _Rng(shape, interpret)
        rng.seed(seed_ref[0], pid)

        st = [state_ref[i] for i in range(N_STATE)]
        row = [row_ref[i] for i in range(row_ref.shape[0])]
        flags = flags_ref[0]
        alive = (flags & FLAG_ALIVE) != 0
        is_pool = (flags & FLAG_POOL) != 0
        in_grid = (flags & FLAG_INGRID) != 0
        ultra_trig = None
        if ultra:
            # per-lane cell geometry from the cell-index bits packed above
            # the FLAG bits and the uniform-grid scalars appended to the SMEM
            # dom vector.  2-D: j at bit 3 (14 bits), i at bit 17 (14 bits);
            # 3-D cartesian: k at bit 3 (10), j at bit 13 (10), i at bit 23
            # (8).  All loop-invariant within the invocation (a lane that
            # leaves its cell stalls).
            if two_d:
                jj = ((flags >> 3) & 0x3FFF).astype(jnp.float32)
                ii = ((flags >> 17) & 0x3FFF).astype(jnp.float32)
                c0u = dom_ref[6] + (ii + 0.5) * dom_ref[7]
                c1u = dom_ref[8] + (jj + 0.5) * dom_ref[9]
                if geom is Geometry.SPHERICAL:
                    s1c = jnp.sin(c1u)
                    c1c = jnp.cos(c1u)
                    cell_geom = (
                        c0u, s1c, c1c,
                        dom_ref[7] + jnp.zeros_like(ii),
                        jnp.cos(0.5 * dom_ref[9]) + jnp.zeros_like(ii),
                    )
                    ultra_trig = (s1c, c1c)
                else:
                    cell_geom = (
                        c0u, c1u,
                        dom_ref[7] + jnp.zeros_like(ii),
                        dom_ref[9] + jnp.zeros_like(ii),
                    )
            else:
                kk = ((flags >> 3) & 0x3FF).astype(jnp.float32)
                jj = ((flags >> 13) & 0x3FF).astype(jnp.float32)
                ii = ((flags >> 23) & 0xFF).astype(jnp.float32)
                zero = jnp.zeros_like(ii)
                cell_geom = (
                    dom_ref[6] + (ii + 0.5) * dom_ref[7],
                    dom_ref[8] + (jj + 0.5) * dom_ref[9],
                    dom_ref[10] + (kk + 0.5) * dom_ref[11],
                    dom_ref[7] + zero, dom_ref[9] + zero, dom_ref[11] + zero,
                )
        else:
            cell_geom = None

        temp = row[COL["temp"]]
        if slim or ultra:
            v0s, v1s = row[COL["v0"]], row[COL["v1"]]
            beta2 = v0s * v0s + v1s * v1s
            if not two_d:
                v2s = row[COL["v2"]]
                beta2 = beta2 + v2s * v2s
            beta_mag = jnp.sqrt(beta2)
            gam = jax.lax.rsqrt(jnp.maximum(1.0 - beta2, _TINY))
            n_e = row[COL["ne_lab"]]
        else:
            gam = row[PCOL["gamma"]]
            beta_mag = jnp.sqrt(jnp.maximum(1.0 - 1.0 / (gam * gam), 0.0))
            n_e = row[PCOL["dens_lab"]] * (1.0 / M_P)
        if use_aux:
            # TABLE / nonthermal: the biased total tau coefficient (with the
            # hot sigma_hat folded in) comes from the XLA-side interpolation;
            # it is a function of (eps', cell) only, so it stays valid until
            # the lane scatters or leaves its cell — both stall the lane.
            n_sigma = aux_ref[AUX_NSIG]
            p_th = aux_ref[AUX_PTH]
        else:
            n_sigma = n_e * THOM_X_SECT
            p_th = None

        if cheb_base:
            from .hot_xsec import CHEB_DHI, CHEB_DLO, LOG_PH_E_MAX

            inv_ln10 = 0.4342944819032518
            ln10 = 2.302585092994046
            inv_knee = row[cheb_base]  # 10^-s = 1 + 12 theta (clipped)
            # loop-invariant across the invocation's rounds: s = -log10 invk,
            # span = LOG_PH_E_MAX - s >= 1 by the knee clip
            lg_invk = jnp.log(jnp.maximum(inv_knee, _TINY)) * inv_ln10
            span_inv = 1.0 / (LOG_PH_E_MAX + lg_invk)
            zero = jnp.zeros_like(inv_knee)

            def _cheb_eval(x_lin, invk, spn, coef_lo, coef_hi):
                """Branch-select Clenshaw shared by the per-cell thermal rows
                and the global subgroup-1 constants: LINEAR x below the KN
                knee (x < 1), log space above it."""
                lo = x_lin < 1.0
                lgx = jnp.log(jnp.maximum(x_lin, _TINY)) * inv_ln10
                t = jnp.where(
                    lo,
                    2.0 * x_lin - 1.0,
                    jnp.clip(2.0 * lgx * spn - 1.0, -1.0, 1.0),
                )
                bk1 = jnp.zeros_like(t)
                bk2 = jnp.zeros_like(t)
                for k in range(CHEB_DHI, 0, -1):
                    ck = jnp.where(lo, coef_lo[k] if k <= CHEB_DLO else zero,
                                   coef_hi[k])
                    bk0 = ck + 2.0 * t * bk1 - bk2
                    bk2 = bk1
                    bk1 = bk0
                f = jnp.where(lo, coef_lo[0], coef_hi[0]) + t * bk1 - bk2
                return jnp.exp(f * ln10)

            def cheb_sigma(e_comv):
                """sigma_hat/sigma_T from the per-cell Chebyshev rows
                (ops.hot_xsec.thermal_cheb_cells)."""
                return _cheb_eval(
                    e_comv * inv_knee, inv_knee, span_inv,
                    [row[cheb_base + 1 + k] for k in range(CHEB_DLO + 1)],
                    [row[cheb_base + 2 + CHEB_DLO + k] for k in range(CHEB_DHI + 1)],
                )

            if nt_inkernel:
                f1 = nt_sub1[0]
                invk1 = nt_sub1[1]
                span1 = nt_sub1[2]
                c1_lo = [s + zero for s in nt_sub1[3:3 + CHEB_DLO + 1]]
                c1_hi = [s + zero for s in nt_sub1[4 + CHEB_DLO:]]

                def sub1_sigma(e_comv):
                    """Global sigma_sub(eps') for subgroup 1 — the tau_norm
                    fallback for thermal-free cells
                    (ops.hot_xsec._sub1_cheb_static)."""
                    return _cheb_eval(e_comv * invk1, invk1, span1, c1_lo, c1_hi)

        def round_body(_, carry):
            (p0, p1, p2, p3, px, py, pz, q, u, v, t_rem, ns,
             c0, c1, c2, c3, stalled, promoted) = carry
            act = alive & (t_rem > 0) & (stalled == 0.0)

            # 1. tau rate from the carried row (transport._tau_rate, DIRECT)
            bx, by, bz = fluid_beta(row, px, py, ug=ultra_trig)
            fl_norm = jnp.sqrt(bx * bx + by * by + bz * bz)
            ph_norm = jnp.sqrt(p1 * p1 + p2 * p2 + p3 * p3)
            denom = jnp.maximum(fl_norm * ph_norm, _TINY)
            cos_ang = (bx * p1 + by * p2 + bz * p3) / denom
            if not cheb_base:
                rate = n_sigma * (1.0 - beta_mag * cos_ang)

            # 2. comoving four-momentum
            b0, b1, b2, b3 = _boost(bx, by, bz, p0, p1, p2, p3)
            upd = act & in_grid
            c0 = jnp.where(upd, b0, c0)
            c1 = jnp.where(upd, b1, c1)
            c2 = jnp.where(upd, b2, c2)
            c3 = jnp.where(upd, b3, c3)
            p_th_round = p_th
            if cheb_base:
                # TABLE mode: sigma_hat at the CURRENT comoving energy, every
                # round (the XLA engine recomputes it per round the same way)
                nsig_th = (n_e * THOM_X_SECT) * cheb_sigma(c0)
                if nt_inkernel:
                    # biased multi-population total: tau0 + N_GAMMA tau_norm,
                    # tau_norm = tau0 for thermal cells else subgroup-1 tau
                    # (transport._tau_rate; Src/optical_depth.c:60-112)
                    nsig_nt1 = (
                        row[PCOL["nonthermal_dens"]] * row[PCOL["gamma"]]
                        * (THOM_X_SECT * f1)
                    ) * sub1_sigma(c0)
                    taunorm = jnp.where(n_e > 0, nsig_th, nsig_nt1)
                    total = nsig_th + n_gamma * taunorm
                    rate = total * (1.0 - beta_mag * cos_ang)
                    p_th_round = nsig_th / jnp.maximum(total, _TINY)
                else:
                    rate = nsig_th * (1.0 - beta_mag * cos_ang)

            # 3. free path -> candidate step
            u1 = rng.uniform_pos()
            mfp = jnp.where(
                in_grid & (rate > 0),
                -jnp.log(u1) / jnp.maximum(rate, _TINY),
                _DEFAULT_MFP,
            )
            dt_scatt = mfp * (1.0 / C_LIGHT)
            will = act & in_grid & (dt_scatt < t_rem)
            dt = jnp.where(will, dt_scatt, t_rem)
            dt = jnp.where(act, dt, 0.0)

            # 4. advance along the lab direction at c
            inv_p0 = 1.0 / jnp.maximum(p0, _TINY)
            moves = act & ~is_pool
            step = jnp.where(moves, C_LIGHT * dt * inv_p0, 0.0)
            px = px + step * p1
            py = py + step * p2
            pz = pz + step * p3
            t_rem = t_rem - dt

            # 5. scatter attempt (null collision on KN reject)
            if stokes_on:
                # lab z-basis(p) -> fluid-boost basis(p); the boost transports
                # it to bf-basis(c), where _single_scatter picks up the
                # collapsed rotation chain
                qc, uc = _rotate_basis(
                    p1, p2, p3, 0.0, 0.0, 1.0, p1, p2, p3, bx, by, bz, q, u
                )
            else:
                qc, uc = q, u
            g_e, gb_e = _thermal_gamma_beta(rng, shape, temp, el_iters)
            if nonthermal:
                # population choice from the biased cumulative optical depths
                # (transport._tau_rate / generateSingleElectron,
                # Src/electron.c:7-68): thermal w.p. p_th, then the subgroups
                # in equal tau_norm-weighted slices of the remainder
                u_pop = rng.uniform()
                is_th = u_pop <= p_th_round
                slice_w = jnp.maximum(
                    (1.0 - p_th_round) * (1.0 / n_gamma), _TINY
                )
                sub_f = jnp.clip(
                    jnp.floor((u_pop - p_th_round) / slice_w), 0.0, n_gamma - 1.0
                )
                g_nt = nt_sample(rng, sub_f)
                gb_nt = jnp.sqrt(jnp.maximum(g_nt * g_nt - 1.0, 0.0))
                g_e = jnp.where(is_th, g_e, g_nt)
                gb_e = jnp.where(is_th, gb_e, gb_nt)
            g0, ex, ey, ez = _electron_from_gamma(rng, g_e, gb_e, c0, c1, c2, c3)
            sc, o0, o1, o2, o3, q2, u2, v2 = _single_scatter(
                rng, shape, g0, ex, ey, ez, c0, c1, c2, c3, qc, uc, v,
                stokes_on, kn_iters, fx=bx, fy=by, fz=bz,
            )
            scattered = will & sc
            l0, l1, l2, l3 = _boost(-bx, -by, -bz, o0, o1, o2, o3)
            if stokes_on:
                # q2/u2 arrive in the (-be)-basis of o: rotate (-be -> -bf
                # about o), ride the fluid de-boost to l, finish at the lab
                # z-basis — two rotations where the round-trip chain paid four
                inv_ge = 1.0 / g0
                ql, ul = _rotate_basis(
                    o1, o2, o3, -ex * inv_ge, -ey * inv_ge, -ez * inv_ge,
                    o1, o2, o3, -bx, -by, -bz, q2, u2,
                )
                ql, ul = _rotate_basis(
                    l1, l2, l3, -bx, -by, -bz, l1, l2, l3, 0.0, 0.0, 1.0, ql, ul
                )
            else:
                ql, ul = q2, u2
            p0 = jnp.where(scattered, l0, p0)
            p1 = jnp.where(scattered, l1, p1)
            p2 = jnp.where(scattered, l2, p2)
            p3 = jnp.where(scattered, l3, p3)
            c0 = jnp.where(scattered, o0, c0)
            c1 = jnp.where(scattered, o1, c1)
            c2 = jnp.where(scattered, o2, c2)
            c3 = jnp.where(scattered, o3, c3)
            if stokes_on:
                q = jnp.where(scattered, ql, q)
                u = jnp.where(scattered, ul, u)
                v = jnp.where(scattered, v2, v)
            ns = ns + scattered.astype(jnp.float32)
            promoted = jnp.maximum(promoted, (scattered & is_pool).astype(jnp.float32))

            # 6. post-move cell validity: stall lanes that left their cell or
            # the domain (outer find_cell_rows re-resolves them).  In aux mode
            # a scatter ALSO stalls the lane: its comoving energy changed, so
            # the XLA-interpolated tau coefficient is stale until refreshed.
            in_cell = in_cell_and_domain(px, py, pz, row, dom_ref, cg=cell_geom)
            stall_now = act & in_grid & ~in_cell & (t_rem > 0)
            if use_aux:
                stall_now = stall_now | (scattered & (t_rem > 0))
            stalled = jnp.maximum(stalled, stall_now.astype(jnp.float32))
            return (p0, p1, p2, p3, px, py, pz, q, u, v, t_rem, ns,
                    c0, c1, c2, c3, stalled, promoted)

        init = (
            st[SP_P0], st[SP_P1], st[SP_P2], st[SP_P3],
            st[SP_X], st[SP_Y], st[SP_Z],
            st[SP_Q], st[SP_U], st[SP_V],
            st[SP_TREM], st[SP_NS],
            st[SP_C0], st[SP_C1], st[SP_C2], st[SP_C3],
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
        )
        (p0, p1, p2, p3, px, py, pz, q, u, v, t_rem, ns,
         c0, c1, c2, c3, stalled, promoted) = _iterate(
            rng, inner_rounds, round_body, init
        )

        out = list(st)
        out[SP_P0], out[SP_P1], out[SP_P2], out[SP_P3] = p0, p1, p2, p3
        out[SP_X], out[SP_Y], out[SP_Z] = px, py, pz
        out[SP_Q], out[SP_U], out[SP_V] = q, u, v
        out[SP_TREM] = t_rem
        out[SP_NS] = ns
        out[SP_C0], out[SP_C1], out[SP_C2], out[SP_C3] = c0, c1, c2, c3
        for i in range(N_STATE):
            state_out_ref[i] = out[i]
        oflags_ref[0] = (
            (stalled > 0).astype(jnp.int32) * OUT_STALLED
            + (promoted > 0).astype(jnp.int32) * OUT_PROMOTED
        )

    return kernel


class FusedRoundsResult(NamedTuple):
    state: jax.Array  # (N_STATE, R, 128) float32
    out_flags: jax.Array  # (1, R, 128) int32 — stalled / promoted bits


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "stokes_on", "inner_rounds", "el_iters", "kn_iters",
        "s_rows", "interpret", "nonthermal", "slim", "cheb_base", "nt_sub1",
        "ultra",
    ),
)
def fused_rounds(
    cfg: Config,
    seed,
    domain,         # (6,) f32: (r0_lo, r0_hi, r1_lo, r1_hi, r2_lo, r2_hi)
    state,          # (N_STATE, R, 128) f32
    rows,           # (PACKED_WIDTH, R, 128) f32
    flags,          # (1, R, 128) int32
    aux=None,       # (N_AUX, R, 128) f32 — TABLE/nonthermal per-lane planes
    block_act=None,  # (R // s_rows,) int32 — 0 marks an all-idle block to skip
    stokes_on: bool = True,
    inner_rounds: int = 4,
    el_iters: int = 12,
    # 12 KN rejection trials keep the no-acceptance residual under 2e-6 of
    # lanes (measured, BASELINE.md r4) and save ~0.5 ms/invocation vs the
    # conservative 16 (round-4 weak #6 lever)
    kn_iters: int = 12,
    s_rows: int = 128,
    interpret: bool = False,
    nonthermal: bool = False,
    slim: bool = False,
    cheb_base: int = 0,
    nt_sub1: tuple = None,
    ultra: bool = False,
) -> FusedRoundsResult:
    """Run ``inner_rounds`` fused transport rounds over blocked photon planes."""
    n_state, r_total, lanes = state.shape
    assert n_state == N_STATE and lanes == LANES
    assert r_total % s_rows == 0, (r_total, s_rows)
    use_aux = aux is not None
    grid = (r_total // s_rows,)
    kernel = _make_kernel(cfg, stokes_on, inner_rounds, el_iters, kn_iters,
                          s_rows, interpret, use_aux, nonthermal, slim=slim,
                          cheb_base=cheb_base, nt_sub1=nt_sub1, ultra=ultra)
    nrow = rows.shape[0]
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]
    if block_act is None:
        block_act = jnp.ones((grid[0],), jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((N_STATE, s_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nrow, s_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [seed, block_act.astype(jnp.int32), domain.astype(jnp.float32),
            state, rows, flags]
    if use_aux:
        in_specs.append(
            pl.BlockSpec((N_AUX, s_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(aux)

    state_out, oflags = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((N_STATE, r_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, r_total, LANES), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((N_STATE, s_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        # The TABLE-mode body's scoped scratch lands ~24 KB over Mosaic's
        # default 16 MB stack budget on v5e; the chip has 128 MB of VMEM, so
        # raise the scoped limit rather than shrink s_rows (smaller blocks
        # cost ~8% grid overhead for no capacity reason).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return FusedRoundsResult(state=state_out, out_flags=oflags)
