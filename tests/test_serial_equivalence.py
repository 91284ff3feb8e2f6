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
