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

import jax.numpy as jnp

from .fourvec import normalize

Z_HAT = jnp.array([0.0, 0.0, 1.0])


def find_xy(v_ph, ref):
    """Stokes-plane basis (x, y) for photon direction ``v_ph`` w.r.t. ``ref``.

    Vectorized findXY (reference: Src/mcrat_scattering.c:41-65):
    y = normalize(ref x v_ph)  [the C code computes vector X v_ph component-wise],
    x = normalize(y x v_ph).
    """
    y = jnp.cross(ref, v_ph)
    y = normalize(y)
    x = jnp.cross(y, v_ph)
    x = normalize(x)
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


def stokes_rotation(boost, v_ph, v_ph_boosted, s):
    """Rotate Stokes vectors through a Lorentz boost.

    Vectorized stokesRotation (reference: Src/mcrat_scattering.c:103-149).
    ``boost`` is the boost 3-velocity, ``v_ph``/``v_ph_boosted`` the photon
    3-momentum before/after the boost.  Two Mueller rotations: z-hat basis ->
    boost-vector basis in the original frame, then boost-vector basis -> z-hat
    basis in the boosted frame.
    """
    z = jnp.broadcast_to(Z_HAT.astype(s.dtype), v_ph.shape)
    x0, y0 = find_xy(v_ph, z)
    x1, y1 = find_xy(v_ph, boost)
    s = mueller_rotate(find_phi(x0, y0, x1, y1), s)
    x2, y2 = find_xy(v_ph_boosted, boost)
    x3, y3 = find_xy(v_ph_boosted, z)
    s = mueller_rotate(find_phi(x2, y2, x3, y3), s)
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
