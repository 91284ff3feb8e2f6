"""Nonthermal electron distribution tests: samplers and transport path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.config import (
    BFieldCalc, Config, Dims, Geometry, NonthermalDist, SimType, Spectrum,
    TauCalculation,
)
from mcrat_tpu.ops import electrons


def _cfg(**kw):
    base = dict(
        dims=Dims.TWO,
        geometry=Geometry.SPHERICAL,
        dtype="float64",
        tau_calculation=TauCalculation.TABLE,
        nonthermal_e_dist=NonthermalDist.POWERLAW,
        powerlaw_index=2.5,
        gamma_min=1.0,
        gamma_max=100.0,
        b_field_calc=BFieldCalc.TOTAL_E,
        epsilon_b=0.5,
    )
    base.update(kw)
    return Config(**base)


def test_power_law_sampler_matches_pdf():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    g = electrons.sample_power_law(key, (200_000,), jnp.float64, 2.5, 1.0, 100.0)
    g = np.asarray(g)
    assert g.min() >= 1.0 and g.max() <= 100.0
    # analytic mean of g^-2.5 on [1, 100]: A * int g^-1.5 = A*(...)
    a = electrons.power_law_norm(2.5, 1.0, 100.0)
    mean_expect = a * (100.0**-0.5 - 1.0) / (-0.5)
    assert abs(g.mean() - mean_expect) < 0.01 * mean_expect + 0.01


def test_restricted_sampler_stays_in_subgroup():
    cfg = _cfg()
    key = jax.random.PRNGKey(1)
    n = 50_000
    # subgroups: [1, 100^(1/3)], [100^(1/3), 100^(2/3)], [100^(2/3), 100]
    sub = jnp.asarray(np.repeat([1, 2, 3], n // 3 + 1)[:n])
    dg = (np.log10(100.0) - 0.0) / 3
    g_lo = 10.0 ** ((np.asarray(sub) - 1) * dg)
    g_hi = 10.0 ** (np.asarray(sub) * dg)
    gamma = electrons.sample_nonthermal_gamma_range(
        key, jnp.asarray(g_lo), jnp.asarray(g_hi), cfg
    )
    gamma = np.asarray(gamma)
    assert (gamma >= g_lo * (1 - 1e-12)).all()
    assert (gamma <= g_hi * (1 + 1e-12)).all()
    # within subgroup 1, distribution still follows g^-2.5 shape: median check
    g1 = gamma[np.asarray(sub) == 1]
    lo, hi = 1.0, 10.0 ** dg
    # analytic median of truncated power law
    p = 2.5
    f = lambda x: (x ** (1 - p) - lo ** (1 - p)) / (hi ** (1 - p) - lo ** (1 - p))
    med = ((lo ** (1 - p) + hi ** (1 - p)) / 2) ** (1 / (1 - p))
    assert abs(np.median(g1) - med) < 0.02 * med


def test_broken_power_law_cdf_monotone_and_normalized():
    cfg = _cfg(
        nonthermal_e_dist=NonthermalDist.BROKENPOWERLAW,
        powerlaw_index=None,
        powerlaw_index_1=1.5,
        powerlaw_index_2=3.0,
        gamma_break=10.0,
    )
    g = jnp.asarray(np.geomspace(1.0, 100.0, 64))
    cdf = np.asarray(
        electrons.broken_power_law_cdf(g, 1.5, 3.0, 1.0, 100.0, 10.0)
    )
    assert cdf[0] == pytest.approx(0.0, abs=1e-12)
    assert cdf[-1] == pytest.approx(1.0, rel=1e-10)
    assert (np.diff(cdf) > 0).all()
    # restricted sampling across the break works
    gamma = electrons.sample_nonthermal_gamma_range(
        jax.random.PRNGKey(2),
        jnp.full((20000,), 5.0),
        jnp.full((20000,), 50.0),
        cfg,
    )
    gamma = np.asarray(gamma)
    assert gamma.min() >= 5.0 and gamma.max() <= 50.0
    assert (gamma > 10.0).any() and (gamma < 10.0).any()


def test_transport_with_nonthermal_electrons(tmp_path):
    """End-to-end: TABLE + powerlaw electrons transport runs and produces
    stronger upscattering than the thermal-only run (hot gamma<=100 electrons
    inverse-Compton boost the photons)."""
    from mcrat_tpu import transport
    from mcrat_tpu.grid import build_rectilinear_index
    from mcrat_tpu.models.analytic import synthetic_spherical_frame
    from mcrat_tpu.ops import cyclosynch, hot_xsec

    cfg_nt = _cfg(simulation_type=SimType.SPHERICAL_OUTFLOW)
    cfg_th = Config(
        dims=Dims.TWO, geometry=Geometry.SPHERICAL, dtype="float64",
        simulation_type=SimType.SPHERICAL_OUTFLOW,
        tau_calculation=TauCalculation.TABLE,
    )
    host, (re_, te_) = synthetic_spherical_frame(
        cfg_nt, r_min=1e12, r_max=2e13, nr=96, ntheta=16, theta_max=np.pi / 3
    )
    host.nonthermal_dens = cyclosynch.nonthermal_electron_dens(cfg_nt, host)
    assert (host.nonthermal_dens > 0).all()
    idx = build_rectilinear_index(re_, te_)
    rng = np.random.default_rng(3)
    arrays, _ = transport.inject_photons(
        host, r_inj=4e12, ph_weight=1e50, min_photons=400, max_photons=2000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 6,
        fps=5.0, rng=rng,
    )
    ph, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    table_nt = hot_xsec.load_or_build(cfg_nt, str(tmp_path / "nt.npz"), dtype="float64")
    table_th = hot_xsec.load_or_build(cfg_th, str(tmp_path / "th.npz"), dtype="float64")

    res_nt = transport.transport_frame(
        cfg_nt, ph, frame, idx, 0.2, jax.random.PRNGKey(0), xsec_table=table_nt
    )
    res_th = transport.transport_frame(
        cfg_th, ph, frame, idx, 0.2, jax.random.PRNGKey(0), xsec_table=table_th
    )
    assert int(res_nt.n_scatt) > 0 and int(res_th.n_scatt) > 0
    e_nt = float(transport.average_photon_energy(res_nt.photons))
    e_th = float(transport.average_photon_energy(res_th.photons))
    # nonthermal scattering channels include gamma up to 100 -> more heating
    assert e_nt > e_th
    # all outputs finite
    assert np.isfinite(np.asarray(res_nt.photons.p)).all()
