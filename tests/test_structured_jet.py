"""Structured-jet (Lundman, Peer & Ryde 2014) polarization validation.

The reference's global validation reproduces LPR14's photospheric polarization
from a structured jet (Doc/mcrat_doc.tex:553-566, figure
comp_lundman_p_4_thetaj_1e-01.pdf: theta_j = 0.1, p = 4, Gamma_0 = 100, i.e.
theta_j Gamma_0 = 10): polarization is ~zero for observers inside the jet core
and rises to the ~several-to-tens-of-percent level for lines of sight through
the shear layer, carried by Q (U vanishes by axisymmetry).

This scaled version (lower luminosity -> smaller photospheric radii, ~1e4
photons) checks the same law as physics CI.  Injection radii are tau-targeted
per viewing band from the analytic profile rather than hand-tuned.

By axisymmetry the z-referenced Stokes parameters are azimuth-invariant, so
the weighted <Q> over a viewing-angle band is directly the observer-frame
polarization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.constants import C_LIGHT, M_P, THOM_X_SECT
from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
from mcrat_tpu.models.analytic import make_grid_2d, structured_fireball_prep
from mcrat_tpu import transport

# max_rounds_per_frame bounds the work spent on photons trapped deep below the
# photosphere inside large analytic frame windows; the observable (escaped)
# population decouples within a few hundred rounds.
CFG = Config(
    dims=Dims.TWO,
    geometry=Geometry.SPHERICAL,
    simulation_type=SimType.SCIENCE,  # prep applied manually with custom L
    dtype="float64",
    max_rounds_per_frame=800,
)

THETA_J = 0.1  # the reference's own validation geometry (theta_j Gamma_0 = 10)
LUMI = 1e50


@pytest.fixture(scope="module")
def jet_problem():
    r_edges = np.geomspace(2e9, 1e16, 289)
    t_edges = np.concatenate([
        np.linspace(0.0, 0.35, 141),  # resolves the core + shear layer
        np.linspace(0.36, 0.8, 23),
    ])
    host = frame_from_numpy(CFG, make_grid_2d(CFG, r_edges, t_edges))
    structured_fireball_prep(
        host, gamma_0=100.0, lumi=LUMI, r00=1e8, theta_j=THETA_J, p=4.0
    )
    idx = build_rectilinear_index(r_edges, t_edges)
    frame = host.to_device(dtype=jnp.float64)
    return host, frame, idx


def _tau_radius(host, theta_mid, tau_target):
    """Radius where the radial optical depth from infinity reaches tau_target
    along the theta = theta_mid column (radial beaming factor ~ 1 - beta)."""
    col = np.abs(host.theta - theta_mid) < 2e-3
    r = host.r[col]
    order = np.argsort(r)
    r = r[order]
    n_e = (host.dens_lab[col] / M_P)[order]
    gam = host.gamma[col][order]
    beta = np.sqrt(np.maximum(1 - gam**-2.0, 0))
    dtau = n_e * THOM_X_SECT * (1 - beta) * np.gradient(r)
    tau_from_out = np.cumsum(dtau[::-1])[::-1]
    i = np.searchsorted(-tau_from_out, -tau_target)
    return float(r[min(i, len(r) - 1)])


def _run_bin(host, frame, idx, r_inj, t_lo, t_hi, seed, n_frames, fps,
             min_photons, max_photons, capacity, shell_frac=0.1):
    """Inject a THIN shell at the tau-targeted radius, then transport.

    The injection shell half-width is ``shell_frac/2 * r_inj`` — decoupled
    from the transport frame duration (1/fps).  With the old coupling
    (half-width = c/(2 fps) = r_inj) the shell spanned [0, 2 r_inj] and the
    per-cell dV Gamma T'^3 weighting concentrated essentially every photon in
    the deep tau ~ 1e4 furnace near the grid floor, where nothing can escape
    within the simulated window — the population measured was never a
    photosphere.
    """
    rng = np.random.default_rng(seed)
    fps_inj = C_LIGHT / (shell_frac * r_inj)
    arrays, _ = transport.inject_photons(
        host, r_inj=r_inj, ph_weight=1e48, min_photons=min_photons,
        max_photons=max_photons, spect=Spectrum.BLACKBODY,
        theta_min=t_lo, theta_max=t_hi, fps=fps_inj, rng=rng,
    )
    ph, _ = transport.photons_from_arrays(arrays, capacity=capacity, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    for _ in range(n_frames):
        key, sub = jax.random.split(key)
        res = transport.transport_frame(CFG, ph, frame, idx, 1.0 / fps, sub, chunk_rounds=800)
        ph = res.photons
    return ph


def _band_polarization(ph, t_lo, t_hi, r_cut):
    """Weighted polarization of *escaped* photons (r > r_cut) reaching an
    observer in the DIRECTION band [t_lo, t_hi).

    Binning by momentum direction (the observer's viewing angle), not by
    position angle: LPR14's Pi(theta_v) is an observer-frame quantity, and a
    position bin mixes lines of sight across the whole local beaming cone.
    """
    p = np.asarray(ph.p)
    w = np.asarray(ph.weight)
    r = np.linalg.norm(np.asarray(ph.pos), axis=1)
    mu = p[:, 3] / np.maximum(np.linalg.norm(p[:, 1:], axis=1), 1e-300)
    theta = np.arccos(np.clip(mu, -1, 1))
    m = (w > 0) & (theta >= t_lo) & (theta < t_hi) & (r > r_cut)
    s = np.asarray(ph.s)
    wsum = w[m].sum()
    if wsum <= 0:
        return 0.0, 0.0, 0.0, 0
    q = np.sum(s[m, 1] * w[m]) / wsum
    u = np.sum(s[m, 2] * w[m]) / wsum
    return float(np.hypot(q, u)), float(q), float(u), int(m.sum())


@pytest.mark.slow
def test_polarization_rises_off_axis(jet_problem):
    """Measured LPR14 structure on this scaled problem (diagnostics,
    2026-08, thin-shell injection): Q(theta_v) is ~0 in the core, peaks
    NEGATIVE around theta_v ~ 2 theta_j at ~2.7x the Rayleigh floor
    ([0.18, 0.22): q = -0.047, floor 0.018), decays beyond 2.6 theta_j, and
    U is consistent with zero everywhere — the qualitative LPR14 law this
    test pins (magnitude parity is not claimed at this scaled luminosity)."""
    host, frame, idx = jet_problem

    # on-axis observers: inject in the jet core at tau ~ 3
    r_on = _tau_radius(host, 0.02, 3.0)
    fps_on = C_LIGHT / (2.0 * r_on)  # frame window = 2 r_inj of light travel
    ph_on = _run_bin(host, frame, idx, r_on, 0.0, 0.05, seed=1,
                     n_frames=4, fps=fps_on,
                     min_photons=2000, max_photons=4000, capacity=4096)

    # shear-layer lines of sight: tau ~ 3 at theta = 2 theta_j
    r_off = _tau_radius(host, 0.2, 3.0)
    fps_off = C_LIGHT / (2.0 * r_off)
    ph_off = _run_bin(host, frame, idx, r_off, 0.10, 0.30, seed=2,
                      n_frames=5, fps=fps_off,
                      min_photons=12000, max_photons=24000, capacity=32768)

    pi_on, q_on, u_on, n_on = _band_polarization(ph_on, 0.0, 0.05, r_cut=3 * r_on)
    # observer band around the polarization peak (theta_v ~ 1.6-2.4 theta_j)
    pi_off, q_off, u_off, n_off = _band_polarization(
        ph_off, 0.16, 0.24, r_cut=3 * r_off
    )
    assert n_on > 300 and n_off > 400, (n_on, n_off)

    # Rayleigh noise floor of the polarization estimator: E[Pi | Pi_true=0]
    floor_on = np.sqrt(np.pi / (4 * n_on))
    floor_off = np.sqrt(np.pi / (4 * n_off))
    # core lines of sight: symmetric -> polarization consistent with zero
    assert pi_on < 3 * floor_on + 0.02, (pi_on, floor_on, n_on)
    # through the shear layer: polarization significantly above the noise
    # floor and above the core value, carried by Q (the LPR14 law)
    assert pi_off > 2 * floor_off, (pi_off, floor_off, n_off)
    assert pi_off > pi_on + floor_off, (pi_off, pi_on)
    assert q_off < 0, (q_off,)
    # U vanishes by axisymmetry (within noise)
    assert abs(u_off) < 4 / np.sqrt(n_off), (u_off, n_off)
