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


def test_2p5d_transport_azimuthal_drag():
    """2.5-D transport e2e (VERDICT r4 weak: the phi-hat velocity path was
    geometry-tested only): photons with ISOTROPIC lab directions scattering
    off a purely azimuthally rotating cylindrical flow (v2 = 0.5 phi-hat,
    reference basis: Src/geometry.c:214-218) must come out dragged along the
    rotation — the scattered subset's mean phi-hat momentum fraction is
    strongly positive, the unscattered subset's is ~0."""
    from mcrat_tpu.config import PhotonType
    from mcrat_tpu.grid import frame_from_numpy
    from mcrat_tpu.models.analytic import make_grid_2d

    cfg = Config(
        dims=Dims.TWO_POINT_FIVE, geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.SCIENCE, dtype="float64",
    )
    r_edges = np.linspace(0.0, 2e11, 41)
    z_edges = np.linspace(-1e11, 1e11, 41)
    arrays_h = make_grid_2d(cfg, r_edges, z_edges)
    n_cells = len(arrays_h["r0"])
    # rotating slab at tau ~ 1.5 across the cylinder: most photons scatter,
    # a healthy minority escapes clean (the isotropic control group)
    arrays_h.update(
        v0=np.zeros(n_cells), v1=np.zeros(n_cells),
        v2=np.full(n_cells, 0.5),
        dens=np.full(n_cells, 2e-11), pres=np.full(n_cells, 2.5e13),
    )
    host = frame_from_numpy(cfg, arrays_h)
    idx = build_rectilinear_index(r_edges, z_edges, dtype="float64")

    n = 4096
    rng = np.random.default_rng(12)
    e = np.full(n, 1e-6)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # positions uniformly inside the cylinder, away from the axis
    rho = np.sqrt(rng.uniform(0.2, 0.9, n)) * 2e11
    phi = rng.uniform(0, 2 * np.pi, n)
    pos = np.stack(
        [rho * np.cos(phi), rho * np.sin(phi), rng.uniform(-8e10, 8e10, n)],
        axis=-1,
    )
    arrays = dict(
        p=np.concatenate([e[:, None], e[:, None] * d], axis=1),
        comv_p=np.concatenate([e[:, None], e[:, None] * d], axis=1),
        pos=pos, s=np.tile([1.0, 0, 0, 0], (n, 1)),
        weight=np.ones(n), num_scatt=np.zeros(n),
        cell=np.full(n, -1, np.int32),
        ptype=np.full(n, int(PhotonType.INJECTED), np.int32),
    )
    ph, _ = transport.photons_from_arrays(arrays, capacity=n, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    res = transport.transport_frame(
        cfg, ph, frame, idx, 2e11 / C_LIGHT, jax.random.PRNGKey(3),
        chunk_rounds=0,
    )
    out = res.photons
    ns = np.asarray(out.num_scatt)
    p = np.asarray(out.p)
    x, y = np.asarray(out.pos[:, 0]), np.asarray(out.pos[:, 1])
    rho_f = np.maximum(np.hypot(x, y), 1e-30)
    # phi-hat momentum fraction at the photon's position
    f_phi = (-y * p[:, 1] + x * p[:, 2]) / (rho_f * p[:, 0])
    scattered = ns > 0
    assert scattered.sum() > 500, scattered.sum()
    assert (~scattered).sum() > 100
    m_sc = float(f_phi[scattered].mean())
    m_un = float(f_phi[~scattered].mean())
    # BOTH halves of the 2.5-D velocity path show the rotation:
    # - scatter side (fluid_beta boosts): scattered photons beam along
    #   +phi-hat, mean fraction ~ beta
    # - rate side (the (1 - beta.n) factor in tau): co-rotating photons
    #   scatter LESS, so the unscattered survivors are +phi-biased too
    assert m_sc > 0.25, (m_sc, m_un)
    assert m_un > 0.1, m_un
    # weight conserved through the 2.5-D path
    np.testing.assert_allclose(
        float(jnp.sum(out.weight)), float(jnp.sum(ph.weight)), rtol=1e-12
    )

    # control: the same slab NOT rotating -> both groups isotropic (pins the
    # effect on v2, not on some geometric artifact of the cylindrical path)
    arrays_h["v2"] = np.zeros(n_cells)
    host0 = frame_from_numpy(cfg, arrays_h)
    res0 = transport.transport_frame(
        cfg, ph, host0.to_device(dtype=jnp.float64), idx, 2e11 / C_LIGHT,
        jax.random.PRNGKey(4), chunk_rounds=0,
    )
    ns0 = np.asarray(res0.photons.num_scatt)
    p0 = np.asarray(res0.photons.p)
    x0, y0 = np.asarray(res0.photons.pos[:, 0]), np.asarray(res0.photons.pos[:, 1])
    f0 = (-y0 * p0[:, 1] + x0 * p0[:, 2]) / (
        np.maximum(np.hypot(x0, y0), 1e-30) * p0[:, 0]
    )
    assert abs(float(f0[ns0 > 0].mean())) < 0.1
    assert abs(float(f0[ns0 == 0].mean())) < 0.1


def test_pad_gather_band_identity():
    """The gather-band pad (transport._pad_gather_band) must be a pure
    layout change: padded-table gathers return exactly the unpadded values,
    tables outside the measured slow band pass through untouched."""
    from mcrat_tpu.transport import _pad_gather_band

    rng = np.random.default_rng(3)
    small = jnp.asarray(rng.standard_normal((4, 1000)), jnp.float32)
    assert _pad_gather_band(small) is small  # below the band: no-op

    nc = 200_000  # inside the measured slow band
    mat = jnp.asarray(rng.standard_normal((3, nc)), jnp.float32)
    padded = _pad_gather_band(mat)
    assert padded.shape == (3, 524_288)
    idx = jnp.asarray(rng.integers(0, nc, 4096), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(padded[:, idx]), np.asarray(mat[:, idx])
    )
