"""Batched vs serial-ordered transport: statistical equivalence.

The central structural claim of the TPU redesign (SURVEY.md section 7): the
batched per-photon free-path engine reproduces the reference's serial
global-min-time event loop *in distribution*.  This test runs both engines on
the identical uniform cylindrical-outflow frame and compares event-count and
energy statistics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
from mcrat_tpu.models.analytic import apply_simulation_type, make_grid_2d
from mcrat_tpu.serial import transport_frame_serial
from mcrat_tpu import transport

CFG = Config(
    dims=Dims.TWO,
    geometry=Geometry.CYLINDRICAL,
    simulation_type=SimType.CYLINDRICAL_OUTFLOW,
    dtype="float64",
)


@pytest.fixture(scope="module")
def problem():
    r0_edges = np.linspace(0.0, 3.2e11, 65)
    r1_edges = np.linspace(1.8e12, 2.6e12, 129)
    host = frame_from_numpy(CFG, make_grid_2d(CFG, r0_edges, r1_edges))
    apply_simulation_type(host)
    idx = build_rectilinear_index(r0_edges, r1_edges)
    rng = np.random.default_rng(0)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50, min_photons=300, max_photons=1200,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    frame = host.to_device(dtype=jnp.float64)
    return arrays, frame, idx


def test_batched_matches_serial_statistics(problem):
    arrays, frame, idx = problem
    dt = 0.03  # sub-frame window keeps the serial oracle's runtime manageable
    ph0, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)

    res_b = transport.transport_frame(CFG, ph0, frame, idx, dt, jax.random.PRNGKey(11))
    res_s = transport_frame_serial(CFG, ph0, frame, idx, dt, jax.random.PRNGKey(22))

    nb = int(res_b.n_scatt)
    ns = int(res_s.n_scatt)
    assert nb > 50 and ns > 50
    # total event counts agree within Poisson fluctuations (5 sigma)
    tol = 5.0 * np.sqrt(nb + ns)
    assert abs(nb - ns) < tol, (nb, ns)

    # mean lab photon energy after transport agrees
    e_b = float(transport.average_photon_energy(res_b.photons))
    e_s = float(transport.average_photon_energy(res_s.photons))
    assert abs(e_b - e_s) / e_s < 0.05

    # per-photon scattering-count distributions agree (mean within errors)
    ns_b = np.asarray(res_b.photons.num_scatt)
    ns_s = np.asarray(res_s.photons.num_scatt)
    mb, ms = ns_b.mean(), ns_s.mean()
    se = np.sqrt(ns_b.var() / len(ns_b) + ns_s.var() / len(ns_s))
    assert abs(mb - ms) < 5.0 * se + 1e-9, (mb, ms, se)

    # radial positions advanced identically in expectation (photons move at c
    # for exactly dt in both engines)
    r_b = np.linalg.norm(np.asarray(res_b.photons.pos), axis=1).mean()
    r_s = np.linalg.norm(np.asarray(res_s.photons.pos), axis=1).mean()
    assert abs(r_b - r_s) / r_s < 1e-3


@pytest.mark.slowish
def test_serial_oracle_table_nonthermal_and_bias_discrimination(tmp_path):
    """Independent oracle for the TABLE + nonthermal path (VERDICT r4
    missing #3): serial.py re-derives sigma_hat (numpy trapezoid quadrature),
    the biased multi-population taus and the generateSingleElectron pick with
    NO code shared with ops.hot_xsec / transport._tau_rate.  The oracle must
    (a) agree with the batched engine on the scattering rate, and (b)
    DISCRIMINATE a deliberately broken bias (bias_i = 1, dropping the
    bias_i tau_i == tau_norm collapse of Src/optical_depth.c:60-112,177-183)
    at well over 3 sigma."""
    from mcrat_tpu.config import NonthermalDist, TauCalculation
    from mcrat_tpu.ops import cyclosynch, hot_xsec

    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float64",
        tau_calculation=TauCalculation.TABLE,
        nonthermal_e_dist=NonthermalDist.POWERLAW,
        powerlaw_index=2.5, gamma_min=1.0, gamma_max=100.0,
    )
    r0_edges = np.linspace(0.0, 3.2e11, 33)
    r1_edges = np.linspace(1.8e12, 2.6e12, 65)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0_edges, r1_edges))
    apply_simulation_type(host)
    host.temp[:] = 5e8  # hot: sigma_hat measurably below Thomson
    host.pres[:] = host.temp**4 * 7.5657e-15 / 3.0
    host.nonthermal_dens = cyclosynch.nonthermal_electron_dens(cfg, host)
    assert (host.nonthermal_dens > 0).any()
    idx = build_rectilinear_index(r0_edges, r1_edges)
    frame = host.to_device(dtype=jnp.float64)
    table = hot_xsec.load_or_build(cfg, str(tmp_path / "x.npz"), dtype="float64")

    rng = np.random.default_rng(5)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50, min_photons=150, max_photons=600,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    dt = 0.006
    ph0, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)

    res_b = transport.transport_frame(
        cfg, ph0, frame, idx, dt, jax.random.PRNGKey(11), xsec_table=table
    )
    res_s = transport_frame_serial(cfg, ph0, frame, idx, dt, jax.random.PRNGKey(22))
    nb, ns = int(res_b.n_scatt), int(res_s.n_scatt)
    assert nb > 25 and ns > 25, (nb, ns)
    # same population size and window -> Poisson-comparable counts.  5 sigma
    # allows the oracle's independent trapezoid sigma_hat ~1% quadrature bias.
    tol = 5.0 * np.sqrt(nb + ns)
    assert abs(nb - ns) < tol, (nb, ns, tol)

    # nonthermal upscatters reach the population: some photon gained a large
    # factor in comoving energy (gamma up to 100 electrons) in BOTH engines
    def max_gain(res):
        e0 = np.asarray(ph0.comv_p[:, 0])
        e1 = np.asarray(res.photons.comv_p[:, 0])
        return float(np.max(e1 / np.maximum(e0, 1e-300)))

    assert max_gain(res_b) > 3.0
    assert max_gain(res_s) > 3.0

    # the deliberately broken bias must be REJECTED.  Dropping the
    # bias_i tau_i == tau_norm collapse leaves total = tau0 + sum tau_i;
    # on this B-equipartition problem the raw nonthermal taus dwarf the
    # thermal one by orders of magnitude, so the EVENT TEMPO explodes —
    # the capped walk consumes almost none of the frame window.  Compare
    # scattering RATES (counts per consumed time): the broken rate is
    # orders of magnitude off, i.e. a z-score far beyond 3.
    res_broken = transport_frame_serial(
        cfg, ph0, frame, idx, dt, jax.random.PRNGKey(22), break_bias=True,
        max_events=250,
    )
    assert res_broken.t_advanced > 0
    rate_ok = ns / res_s.t_advanced
    rate_broken = res_broken.n_scatt / res_broken.t_advanced
    assert rate_broken > 10.0 * rate_ok, (rate_broken, rate_ok)
    # ... and the correct-bias oracle above already matched the batched
    # engine at 5 sigma, so the discrimination is one-sided and decisive
