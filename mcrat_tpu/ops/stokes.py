"""Batched Stokes-vector transport.

TPU-native re-design of the reference's polarization machinery
(Src/mcrat_scattering.c:10-149): Stokes basis construction (findXY), basis
rotation angle (findPhi), the Mueller rotation matrix applied in closed form,
and the composite rotate-around-boost operation (stokesRotation) applied at
every frame change (reference call sites: Src/mclib.c:1224-1230,1278-1288).

Stokes vectors are ``(..., 4)`` arrays (I, Q/I, U/I, V/I) with I == 1; photon
direction vectors are ``(..., 3)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .fourvec import normalize

# host-side constant: a module-level jnp.array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize() (it must
# run before ANY backend init in a multi-process job)
import numpy as _np

Z_HAT = _np.array([0.0, 0.0, 1.0])


def find_xy(v_ph, ref):
    """Stokes-plane basis (x, y) for photon direction ``v_ph`` w.r.t. ``ref``.

    Vectorized findXY (reference: Src/mcrat_scattering.c:41-65):
    y = normalize(ref x v_ph)  [the C code computes vector X v_ph component-wise],
    x = normalize(y x v_ph).
    """
    y = normalize(jnp.cross(ref, v_ph))
    x = normalize(jnp.cross(y, v_ph))
    return x, y


def find_phi(x_old, y_old, x_new, y_new):
    """Rotation angle between two Stokes bases.

    Vectorized findPhi (reference: Src/mcrat_scattering.c:67-101):
    sign from x_old . y_new; magnitude acos(y_old . y_new) with the dot product
    clamped against numerical |d| > 1.
    """
    d_xy = jnp.sum(x_old * y_new, axis=-1)
    factor = jnp.sign(d_xy)
    d_yy = jnp.clip(jnp.sum(y_old * y_new, axis=-1), -1.0, 1.0)
    return -factor * jnp.arccos(d_yy)


def mueller_rotate(theta, s):
    """Apply the Mueller rotation matrix to Stokes vectors, in closed form.

    Vectorized mullerMatrixRotation (reference: Src/mcrat_scattering.c:10-39):

        I' = I;  Q' = Q cos2t - U sin2t;  U' = Q sin2t + U cos2t;  V' = V
    """
    c = jnp.cos(2.0 * theta)
    si = jnp.sin(2.0 * theta)
    q = s[..., 1]
    u = s[..., 2]
    return jnp.stack(
        [s[..., 0], c * q - si * u, si * q + c * u, s[..., 3]], axis=-1
    )


def mueller_rotate_cs(c2, s2, s):
    """Mueller rotation with (cos 2theta, sin 2theta) given directly."""
    q = s[..., 1]
    u = s[..., 2]
    return jnp.stack(
        [s[..., 0], c2 * q - s2 * u, s2 * q + c2 * u, s[..., 3]], axis=-1
    )


def rotate_basis_vectors(v_old, ref_old, v_new, ref_new, s):
    """Stokes rotation between the bases defined by (v_old, ref_old) and
    (v_new, ref_new) without constructing the bases.

    Algebraic collapse of
        rotate_basis(*find_xy(v_old, ref_old), *find_xy(v_new, ref_new), s):
    with A = ref_old x v_old (∝ y_old) and B = ref_new x v_new (∝ y_new),

        d_yy = (A . B) / (|A| |B|),   sign factor f = sign((A x v_old) . B)

    since x_old ∝ (ref_old x v_old) x v_old.  Three cross products, three dots
    and one rsqrt replace eight cross products and eight normalizations
    (8 sqrt + 24 divides) — this chain runs 4+ times per transport round.
    Degenerate bases (v parallel to ref, so A or B vanishes) give d = 0 and
    f = 0, reducing to the identity exactly like find_phi's sign(0) = 0 path.
    """
    a = jnp.cross(ref_old, v_old)
    b = jnp.cross(ref_new, v_new)
    dot_ab = jnp.sum(a * b, axis=-1)
    n2 = jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1)
    d = jnp.clip(
        dot_ab * jax.lax.rsqrt(jnp.maximum(n2, jnp.finfo(s.dtype).tiny)),
        -1.0,
        1.0,
    )
    d = jnp.where(n2 > 0, d, 0.0)
    f = jnp.sign(jnp.sum(jnp.cross(a, v_old) * b, axis=-1))
    c2 = jnp.where(f == 0, 1.0, 2.0 * d * d - 1.0)
    s2 = -f * 2.0 * d * jnp.sqrt(jnp.maximum(1.0 - d * d, 0.0))
    return mueller_rotate_cs(c2, s2, s)


def rotate_basis(x_old, y_old, x_new, y_new, s):
    """Rotate Stokes vectors between two bases: mueller_rotate(find_phi(...), s)
    without the arccos -> cos/sin round trip.

    With d = clip(y_old . y_new) and sign f = sign(x_old . y_new), find_phi
    returns theta = -f acos(d) (reference: Src/mcrat_scattering.c:67-101), so

        cos 2theta = 2 d^2 - 1
        sin 2theta = -f * 2 d sqrt(1 - d^2)

    — three transcendentals replaced by one sqrt per rotation, on the hottest
    polarization path (6+ rotations per transport round).
    """
    d_xy = jnp.sum(x_old * y_new, axis=-1)
    d = jnp.clip(jnp.sum(y_old * y_new, axis=-1), -1.0, 1.0)
    f = jnp.sign(d_xy)
    # f == 0 (degenerate basis, e.g. zero-velocity boost) must reduce to the
    # identity exactly as find_phi's theta = -0 * acos(d) = 0 does.
    c2 = jnp.where(f == 0, 1.0, 2.0 * d * d - 1.0)
    s2 = -f * 2.0 * d * jnp.sqrt(jnp.maximum(1.0 - d * d, 0.0))
    return mueller_rotate_cs(c2, s2, s)


def stokes_rotation(boost, v_ph, v_ph_boosted, s):
    """Rotate Stokes vectors through a Lorentz boost.

    Vectorized stokesRotation (reference: Src/mcrat_scattering.c:103-149).
    ``boost`` is the boost 3-velocity, ``v_ph``/``v_ph_boosted`` the photon
    3-momentum before/after the boost.  Two Mueller rotations: z-hat basis ->
    boost-vector basis in the original frame, then boost-vector basis -> z-hat
    basis in the boosted frame.
    """
    z = jnp.broadcast_to(jnp.asarray(Z_HAT, s.dtype), v_ph.shape)
    s = rotate_basis_vectors(v_ph, z, v_ph, boost, s)
    s = rotate_basis_vectors(v_ph_boosted, boost, v_ph_boosted, z, s)
    return s


def fano_scatter_stokes(s, e0, e1, cos_theta):
    """Scatter Stokes vectors with the Fano/Compton matrix and renormalize I=1.

    Vectorized form of the matrix at reference Src/mcrat_scattering.c:411-433
    (Lundman's convention). ``e0``/``e1`` are incoming/scattered photon energies
    in units of m_e c (so e0 - e1 is the reference's (p0_orig - p0_new)/(m_e c)),
    ``cos_theta`` the scattering angle cosine.
    """
    ct = cos_theta
    st2 = jnp.maximum(1.0 - ct * ct, 0.0)
    de = e0 - e1
    m00 = 1.0 + ct * ct + (1.0 - ct) * de
    m01 = st2
    m11 = 1.0 + ct * ct
    m22 = 2.0 * ct
    m33 = 2.0 * ct + ct * (1.0 - ct) * de
    i = m00 * s[..., 0] + m01 * s[..., 1]
    q = m01 * s[..., 0] + m11 * s[..., 1]
    u = m22 * s[..., 2]
    v = m33 * s[..., 3]
    inv_i = 1.0 / i
    return jnp.stack([jnp.ones_like(i), q * inv_i, u * inv_i, v * inv_i], axis=-1)
