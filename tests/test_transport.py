"""End-to-end transport slice: analytic spherical outflow, thermal BB injection,
unpolarized/polarized Compton, single device.

This is the framework's version of the reference's analytic-outflow integration
tests (SURVEY.md section 4 item 1; reference: Src/analytic_outflows.c).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.constants import C_LIGHT, KB_OVER_MEC2, ME_C2
from mcrat_tpu.grid import build_rectilinear_index
from mcrat_tpu.models.analytic import synthetic_spherical_frame
from mcrat_tpu import transport


CFG = Config(
    dims=Dims.TWO,
    geometry=Geometry.SPHERICAL,
    simulation_type=SimType.SPHERICAL_OUTFLOW,
    dtype="float64",
)

R_INJ = 5e12
FPS = 5.0


@pytest.fixture(scope="module")
def frame_and_index():
    host, (r_edges, t_edges) = synthetic_spherical_frame(
        CFG, r_min=1e12, r_max=6e13, nr=192, ntheta=32, theta_max=np.pi / 3
    )
    idx = build_rectilinear_index(r_edges, t_edges)
    return host, idx


@pytest.fixture(scope="module")
def injected(frame_and_index):
    host, _ = frame_and_index
    rng = np.random.default_rng(7)
    arrays, w = transport.inject_photons(
        host,
        r_inj=R_INJ,
        ph_weight=1e50,
        min_photons=800,
        max_photons=4000,
        spect=Spectrum.BLACKBODY,
        theta_min=0.0,
        theta_max=np.pi / 6,
        fps=FPS,
        rng=rng,
    )
    return arrays, w


def test_injection_spectrum_is_blackbody(injected, frame_and_index):
    """Comoving injected energies follow the Planck *energy* spectrum that the
    Bjorkman & Wood (2001) method samples (reference: Src/mclib.c:199-214):
    p(x) ~ x^3/(e^x - 1), so <h nu>/kT = 4! zeta(5)/(3! zeta(4)) ~ 3.832."""
    host, _ = frame_and_index
    arrays, _ = injected
    n = len(arrays["weight"])
    assert 800 <= n <= 4000
    temps = host.temp[arrays["cell"]]
    e_hat = arrays["comv_p"][:, 0]
    ratio = e_hat / (KB_OVER_MEC2 * temps)
    assert abs(ratio.mean() - 3.832) < 0.1


def test_injection_lab_energy_boosted(injected, frame_and_index):
    """Lab energies are Doppler boosted: <E_lab> ~ Gamma <E_comv> for isotropic
    comoving emission from a Gamma >> 1 flow."""
    host, _ = frame_and_index
    arrays, _ = injected
    gam = host.gamma[arrays["cell"]]
    ratio = arrays["p"][:, 0] / (arrays["comv_p"][:, 0] * gam)
    assert abs(ratio.mean() - 1.0) < 0.05


def test_injection_positions_in_shell(injected):
    arrays, _ = injected
    r = np.linalg.norm(arrays["pos"], axis=1)
    half = 0.5 * C_LIGHT / FPS
    # positions are uniform within cells whose *corners* touch the shell,
    # so allow one typical cell size of slack
    slack = 2e12
    assert r.min() > R_INJ - half - slack
    assert r.max() < R_INJ + half + slack


def test_null_norm_on_injection(injected):
    arrays, _ = injected
    p = arrays["p"]
    np.testing.assert_allclose(
        np.linalg.norm(p[:, 1:], axis=1), p[:, 0], rtol=1e-12
    )


@pytest.mark.parametrize("stokes_on", [False, True])
def test_transport_frame_basics(frame_and_index, injected, stokes_on):
    host, idx = frame_and_index
    arrays, w = injected
    ph, meta = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    res = transport.transport_frame(
        CFG, ph, frame, idx, 1.0 / FPS, jax.random.PRNGKey(3), stokes_on=stokes_on
    )
    out = res.photons

    # weights conserved exactly (no absorption in this config)
    np.testing.assert_allclose(
        np.asarray(out.weight).sum(), np.asarray(ph.weight).sum(), rtol=1e-12
    )
    # photons all moved: every live photon advanced a full frame interval, so
    # its position changed by exactly c*dt_max along (possibly scattered) paths
    d = np.linalg.norm(np.asarray(out.pos) - np.asarray(ph.pos), axis=1)
    assert (d > 0).all()
    assert d.max() <= C_LIGHT / FPS * (1 + 1e-9)

    # there was real scattering activity in a tau >~ 1 region
    assert int(res.n_scatt) > 0
    assert float(jnp.max(out.num_scatt)) >= 1

    # four-momentum stays null and finite
    p = np.asarray(out.p)
    np.testing.assert_allclose(np.linalg.norm(p[:, 1:], axis=1), p[:, 0], rtol=1e-9)
    assert np.isfinite(np.asarray(out.s)).all()
    # Stokes I stays exactly 1
    np.testing.assert_array_equal(np.asarray(out.s)[:, 0][np.asarray(out.weight) > 0], 1.0)


def test_transport_multiframe_cooling(frame_and_index, injected):
    """Photospheric evolution sanity: scattering activity decays as the flow
    expands, and comoving energies adiabatically cool while lab energies are
    roughly conserved after decoupling."""
    host, idx = frame_and_index
    arrays, w = injected
    ph, meta = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    e0 = float(transport.average_photon_energy(ph))
    key = jax.random.PRNGKey(5)
    scatts = []
    for i in range(4):
        key, sub = jax.random.split(key)
        res = transport.transport_frame(CFG, ph, frame, idx, 1.0 / FPS, sub)
        ph = res.photons
        scatts.append(int(res.n_scatt))
    e1 = float(transport.average_photon_energy(ph))
    # scattering rate decreases with radius (tau ~ r^-1 in a coasting wind)
    assert scatts[-1] < scatts[0]
    # mean lab energy stays within a factor ~2 (no runaway heating/cooling)
    assert 0.3 < e1 / e0 < 3.0
    # photons streamed outward by ~ c * total time
    r = np.linalg.norm(np.asarray(ph.pos), axis=1)
    assert r.mean() > R_INJ + 2 * C_LIGHT / FPS
