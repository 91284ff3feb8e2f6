"""3-D transport: injection, cell lookup, and scattering on a 3-D spherical grid.

The reference supports 3-D hydro (DIMENSIONS == THREE with CARTESIAN /
SPHERICAL / POLAR geometries); this exercises the full 3-D path end-to-end
(BASELINE.json config #4 is a 3-D run).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.constants import C_LIGHT
from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
from mcrat_tpu.models.analytic import apply_simulation_type
from mcrat_tpu import transport

CFG = Config(
    dims=Dims.THREE,
    geometry=Geometry.SPHERICAL,
    simulation_type=SimType.SPHERICAL_OUTFLOW,
    dtype="float64",
)


def make_grid_3d(r_edges, t_edges, p_edges):
    rc = 0.5 * (r_edges[:-1] + r_edges[1:])
    tc = 0.5 * (t_edges[:-1] + t_edges[1:])
    pc = 0.5 * (p_edges[:-1] + p_edges[1:])
    R, T, P = np.meshgrid(rc, tc, pc, indexing="ij")
    DR = np.broadcast_to(np.diff(r_edges)[:, None, None], R.shape)
    DT = np.broadcast_to(np.diff(t_edges)[None, :, None], T.shape)
    DP = np.broadcast_to(np.diff(p_edges)[None, None, :], P.shape)
    n = R.size
    return dict(
        r0=R.ravel(), r1=T.ravel(), r2=P.ravel(),
        dr0=DR.ravel(), dr1=DT.ravel(), dr2=DP.ravel(),
        v0=np.zeros(n), v1=np.zeros(n), v2=np.zeros(n),
        dens=np.ones(n), pres=np.ones(n),
    )


@pytest.fixture(scope="module")
def problem3d():
    r_edges = np.geomspace(1e12, 2e13, 97)
    t_edges = np.linspace(1e-3, np.pi / 3, 25)
    p_edges = np.linspace(0.0, 2 * np.pi, 17)
    arrays = make_grid_3d(r_edges, t_edges, p_edges)
    host = frame_from_numpy(CFG, arrays)
    apply_simulation_type(host)
    idx = build_rectilinear_index(r_edges, t_edges, p_edges)
    return host, idx


def test_3d_transport_end_to_end(problem3d):
    host, idx = problem3d
    rng = np.random.default_rng(0)
    arrays, w = transport.inject_photons(
        host, r_inj=3e12, ph_weight=1e50, min_photons=400, max_photons=2000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 6,
        fps=5.0, rng=rng,
    )
    n = len(arrays["weight"])
    assert 400 <= n <= 2000
    # 3-D injection places photons inside their cells (no 2-D phi trick)
    r = np.linalg.norm(arrays["pos"], axis=1)
    assert (np.abs(r - 3e12) < 0.5 * C_LIGHT / 5.0 + 5e11).all()
    # azimuthal coverage
    phi = np.arctan2(arrays["pos"][:, 1], arrays["pos"][:, 0])
    assert phi.std() > 1.0

    ph, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    res = transport.transport_frame(
        CFG, ph, frame, idx, 0.2, jax.random.PRNGKey(0), chunk_rounds=0
    )
    out = res.photons
    assert int(res.n_scatt) > 0
    np.testing.assert_allclose(
        float(jnp.sum(out.weight)), float(jnp.sum(ph.weight)), rtol=1e-12
    )
    p = np.asarray(out.p)
    np.testing.assert_allclose(np.linalg.norm(p[:, 1:], axis=1), p[:, 0], rtol=1e-9)
    # photons advanced a full frame window
    d = np.linalg.norm(np.asarray(out.pos) - np.asarray(ph.pos), axis=1)
    assert d.max() <= C_LIGHT * 0.2 * (1 + 1e-9)
    assert (d > 0).all()


def test_3d_binned_index_lookup(problem3d):
    """The AMR-style uniform-bin index agrees with the rectilinear index in 3-D."""
    from mcrat_tpu.grid import build_binned_index, find_cell

    host, idx = problem3d
    frame = host.to_device(dtype=jnp.float64)
    binned = build_binned_index(host)
    rng = np.random.default_rng(3)
    n = 2000
    r = rng.uniform(1.2e12, 1.8e13, n)
    th = rng.uniform(0.05, np.pi / 3 - 0.05, n)
    phi = rng.uniform(0.05, 2 * np.pi - 0.05, n)
    pos = np.stack(
        [r * np.sin(th) * np.cos(phi), r * np.sin(th) * np.sin(phi), r * np.cos(th)],
        axis=-1,
    )
    cached = jnp.full((n,), -1, jnp.int32)
    c_rect, _ = find_cell(CFG, idx, frame, jnp.asarray(pos), cached)
    c_binn, _ = find_cell(CFG, binned, frame, jnp.asarray(pos), cached)
    np.testing.assert_array_equal(np.asarray(c_rect), np.asarray(c_binn))
    assert (np.asarray(c_rect) >= 0).all()
