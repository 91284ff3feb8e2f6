"""Polarization physics validation.

Re-creates the reference's documented (but unscripted) kernel-level checks
(SURVEY.md section 4 item 2; reference: Doc/mcrat_doc.tex:526-550 and the dead
test fixture at Src/mcrat_scattering.c:190-208) as automated tests:

* De Paola (2003): azimuthal modulation of Compton-scattered photons from a
  100%-polarized 100 keV beam, against the independent polarized-KN formula
  dsigma ~ (e/e0)^2 (e/e0 + e0/e - 2 sin^2 T cos^2 eta).
* Thomson single-scatter polarization degree Pi(T) = (1-cos^2 T)/(1+cos^2 T)
  for an unpolarized beam off cold electrons, measured in the scattering-plane
  Stokes basis (exercises every rotation in the pipeline).
* Krawczynski (2011)-style check: a gamma=100 electron beam vs a polarized
  photon beam — inverse-Compton kinematic bounds and Stokes sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.constants import H_OVER_MEC2, ME_C2
from mcrat_tpu.ops import compton
from mcrat_tpu.ops.stokes import find_phi, find_xy, mueller_rotate

N = 400_000


def _scatter_beam(e0, s0, el_p, n=N, seed=0):
    key = jax.random.PRNGKey(seed)
    ph = jnp.tile(jnp.array([e0, e0, 0.0, 0.0]), (n, 1))  # beam along +x
    el = jnp.tile(jnp.asarray(el_p), (n, 1))
    s = jnp.tile(jnp.asarray(s0, dtype=jnp.float64), (n, 1))
    return compton.single_scatter(key, el, ph, s, stokes_on=True)


def test_depaola_azimuthal_modulation():
    """100%-polarized 100 keV beam on cold electrons: the scattered azimuth
    (measured from the polarization vector) follows the polarized KN cross
    section for 85 deg < theta < 90 deg (reference figure:
    Doc/phi_sampling_depaola.pdf)."""
    e0 = 100.0 / 511.0  # 100 keV in m_e c^2
    # beam along +x with Q=+1: per the reference convention (Src/mcrat.h:157)
    # Q=+1 lies along y_tilde = z_hat x k0 = +y_hat, so the polarization
    # vector is y_hat.
    res = _scatter_beam(e0, [1.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0])
    k = np.asarray(res.ph_p[:, 1:])
    kn = k / np.linalg.norm(k, axis=1, keepdims=True)
    sc = np.asarray(res.scattered)
    cos_T = kn[:, 0]  # polar angle from the beam (+x)
    sel = sc & (cos_T < np.cos(np.radians(85))) & (cos_T > np.cos(np.radians(90)))
    eta = np.arctan2(kn[sel, 2], kn[sel, 1])  # azimuth from y_hat (the pol vector)

    # analytic target at the mean polar angle of the band, with the pdf
    # *integrated over each bin*: near the sharp minima (eta = 0, +/-pi) the
    # quadratic pdf's bin average exceeds its bin-center value by ~50%, so a
    # center-sampled comparison has an O(1) systematic there.
    # Integral of cos^2 eta over a bin = w/2 + (sin 2b - sin 2a)/4.
    T = np.arccos(cos_T[sel]).mean()
    ratio = 1.0 / (1.0 + e0 * (1.0 - np.cos(T)))  # e/e0
    grid = np.linspace(-np.pi, np.pi, 25)
    centers = 0.5 * (grid[:-1] + grid[1:])
    w = grid[1] - grid[0]
    cos2_bin = 0.5 + (np.sin(2.0 * grid[1:]) - np.sin(2.0 * grid[:-1])) / (4.0 * w)
    pdf = ratio**2 * (ratio + 1.0 / ratio - 2.0 * np.sin(T) ** 2 * cos2_bin)
    pdf = pdf / pdf.sum()
    hist, _ = np.histogram(eta, bins=grid)
    frac = hist / hist.sum()
    # modulation must match in shape: minima along the polarization vector
    # (eta = 0, +/-pi), maxima perpendicular
    assert frac[np.abs(centers) < 0.3].mean() < 0.6 * frac[np.abs(np.abs(centers) - np.pi / 2) < 0.3].mean()
    np.testing.assert_allclose(frac, pdf, atol=3.5 / np.sqrt(hist.sum() / len(centers)) / len(centers))


def test_thomson_polarization_degree():
    """Unpolarized low-energy beam off cold electrons: in the scattering-plane
    basis, Q = sin^2 T/(1 + cos^2 T) (perpendicular polarization), U ~ 0."""
    e0 = 1e-4
    res = _scatter_beam(e0, [1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], seed=3)
    k = np.asarray(res.ph_p[:, 1:], dtype=np.float64)
    kn = k / np.linalg.norm(k, axis=1, keepdims=True)
    s = np.asarray(res.s)
    k0 = np.zeros_like(kn)
    k0[:, 0] = 1.0
    z = np.zeros_like(kn)
    z[:, 2] = 1.0

    # rotate measured Stokes from the z-referenced basis into the k0-k
    # scattering-plane basis (y perpendicular to the plane)
    x_old, y_old = find_xy(jnp.asarray(kn), jnp.asarray(z))
    x_new, y_new = find_xy(jnp.asarray(kn), jnp.asarray(k0))
    phi = find_phi(x_old, y_old, x_new, y_new)
    s_plane = np.asarray(mueller_rotate(phi, jnp.asarray(s)))

    cos_T = kn[:, 0]
    # exclude near-forward/backward where the plane is ill-defined
    ok = np.asarray(res.scattered) & (np.abs(cos_T) < 0.95)
    bins = np.linspace(-0.95, 0.95, 12)
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = ok & (cos_T >= lo) & (cos_T < hi)
        if m.sum() < 2000:
            continue
        ct = cos_T[m].mean()
        expect = (1.0 - ct * ct) / (1.0 + ct * ct)
        got_q = s_plane[m, 1].mean()
        got_u = s_plane[m, 2].mean()
        assert abs(got_q - expect) < 0.03, (ct, got_q, expect)
        assert abs(got_u) < 0.03


def test_krawczynski_inverse_compton_beam():
    """gamma=100 electron beam against a polarized nu=1e12 Hz photon beam
    (the reference's dead fixture, Src/mcrat_scattering.c:190-208): scattered
    energies obey inverse-Compton kinematics e' <= e * gamma^2 (1+beta)^2 and
    the Stokes vectors stay physical."""
    e0 = 1e12 * H_OVER_MEC2  # h nu / m_e c^2 ~ 8e-9
    gamma = 100.0
    beta = np.sqrt(1 - 1 / gamma**2)
    theta = np.radians(85.0)
    el = [
        gamma,
        gamma * beta * np.sin(theta),
        0.0,
        gamma * beta * np.cos(theta),
    ]
    res = _scatter_beam(e0, [1.0, 1.0, 0.0, 0.0], el, n=100_000, seed=5)
    sc = np.asarray(res.scattered)
    e1 = np.asarray(res.ph_p[:, 0])[sc]
    assert sc.mean() > 0.95  # Thomson regime in the electron frame
    e_max = e0 * gamma**2 * (1 + beta) ** 2
    assert e1.max() <= e_max * 1.01
    # mean upscatter: photon along +x, electron at 85 deg from z i.e. nearly
    # along the beam -> rest-frame energy e gamma (1 - beta cos alpha) with
    # cos alpha = sin(theta); the return boost gives ~gamma^2 (1 - beta cos a)
    cos_a = np.sin(theta)
    scale = e0 * gamma**2 * (1.0 - beta * cos_a)
    assert 0.2 * scale < e1.mean() < 5.0 * scale
    s = np.asarray(res.s)[sc]
    assert np.all(np.abs(s[:, 1:]) <= 1.0 + 1e-9)
    assert np.allclose(s[:, 0], 1.0)
    # degree of polarization is <= 1
    pol = np.sqrt(s[:, 1] ** 2 + s[:, 2] ** 2 + s[:, 3] ** 2)
    assert np.all(pol <= 1.0 + 1e-9)


def test_stokes_identity_roundtrip():
    """A scatter with theta forced tiny (forward) leaves Q/U nearly unchanged:
    exercised via the energy-conservation of near-forward Compton events."""
    e0 = 1e-6
    res = _scatter_beam(e0, [1.0, 0.6, 0.3, 0.0], [1.0, 0.0, 0.0, 0.0], n=50_000, seed=9)
    k = np.asarray(res.ph_p[:, 1:])
    kn = k / np.linalg.norm(k, axis=1, keepdims=True)
    fwd = np.asarray(res.scattered) & (kn[:, 0] > 0.999)
    s = np.asarray(res.s)[fwd]
    # forward scattering: basis unchanged, Fano matrix -> identity-ish
    np.testing.assert_allclose(s[:, 1], 0.6, atol=0.05)
    np.testing.assert_allclose(s[:, 2], 0.3, atol=0.05)
