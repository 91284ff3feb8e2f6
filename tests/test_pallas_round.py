"""Fused Pallas transport kernel vs the XLA reference path.

The fused kernel (mcrat_tpu.ops.pallas_round) must agree with
transport.transport_rounds in distribution: same physics, same frame
semantics, different (hardware vs threefry) random streams.  On CPU the
kernel runs in Pallas interpret mode with the murmur-hash RNG fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrat_tpu import transport
from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
from mcrat_tpu.models.analytic import (
    apply_simulation_type,
    make_grid_2d,
    synthetic_spherical_frame,
)
from mcrat_tpu.ops.rng import make_key


def _cylindrical_problem(n_min=1500, n_max=4000):
    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float32",
    )
    r0e = np.linspace(0.0, 3.2e11, 33)
    r1e = np.linspace(1.8e12, 2.9e12, 65)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0e, r1e))
    apply_simulation_type(host)
    idx = build_rectilinear_index(r0e, r1e, dtype="float32")
    rng = np.random.default_rng(7)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50, min_photons=n_min, max_photons=n_max,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    return cfg, photons, host.to_device(dtype=jnp.float32), idx


def _spherical_problem():
    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.SPHERICAL,
        simulation_type=SimType.SPHERICAL_OUTFLOW, dtype="float32",
    )
    host, (re_, te_) = synthetic_spherical_frame(
        cfg, r_min=5e12, r_max=4e13, nr=48, ntheta=6, theta_max=np.pi / 3
    )
    idx = build_rectilinear_index(re_, te_, dtype="float32")
    rng = np.random.default_rng(3)
    arrays, _ = transport.inject_photons(
        host, r_inj=1e13, ph_weight=1e50, min_photons=1000, max_photons=4000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 6,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    return cfg, photons, host.to_device(dtype=jnp.float32), idx


def _stats(res):
    ph = res.photons
    alive = np.asarray(ph.alive)
    e = np.asarray(ph.p[:, 0])[alive]
    ns = np.asarray(ph.num_scatt)[alive]
    r = np.linalg.norm(np.asarray(ph.pos), axis=1)[alive]
    s = np.asarray(ph.s)[alive]
    return dict(
        w=float(jnp.sum(ph.weight)), e=e.mean(), ns=ns.mean(), r=r.mean(),
        q=float(s[:, 1].mean()), u=float(s[:, 2].mean()),
        n_scatt=int(res.n_scatt),
    )


@pytest.mark.parametrize("problem", ["cylindrical", "spherical"])
def test_fused_matches_xla_statistics(problem):
    cfg, photons, frame, idx = (
        _cylindrical_problem() if problem == "cylindrical" else _spherical_problem()
    )
    # window sized so both problems accumulate >~300 scatters (the spherical
    # problem is optically thin; small counts made this test 2-sigma flaky)
    dt = jnp.float32(0.05 if problem == "cylindrical" else 0.3)
    t_rem = transport.frame_time(photons, dt)
    res_x = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, make_key(1), max_rounds=24
    )
    res_f = transport.transport_rounds_fused(
        cfg, photons, frame, idx, t_rem, make_key(1),
        max_rounds=24, inner_rounds=2, s_rows=32, interpret=True,
    )
    a, b = _stats(res_x), _stats(res_f)
    assert b["w"] == pytest.approx(a["w"], rel=1e-6)  # weight conserved exactly
    # same-population means under different streams: Monte Carlo tolerances
    assert b["n_scatt"] == pytest.approx(a["n_scatt"], rel=0.12)
    assert b["ns"] == pytest.approx(a["ns"], rel=0.1)
    assert b["e"] == pytest.approx(a["e"], rel=0.08)
    assert b["r"] == pytest.approx(a["r"], rel=1e-3)
    assert abs(b["q"] - a["q"]) < 0.05
    assert abs(b["u"] - a["u"]) < 0.05


def test_fused_hot_frame_matches_xla():
    """A frame above the 1e7 K sampler switch must take the Maxwell-Juttner
    branch of the per-block cond (ops/pallas_round._sample_thermal_electron)
    and still agree with the XLA path in distribution."""
    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float32",
    )
    r0e = np.linspace(0.0, 3.2e11, 33)
    r1e = np.linspace(1.8e12, 2.9e12, 65)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0e, r1e))
    apply_simulation_type(host)
    host.temp[:] = 5e8  # theta ~ 0.07: relativistic Maxwell-Juttner regime
    idx = build_rectilinear_index(r0e, r1e, dtype="float32")
    rng = np.random.default_rng(11)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50, min_photons=1500, max_photons=4000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    t_rem = transport.frame_time(photons, jnp.float32(0.05))
    res_x = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, make_key(5), max_rounds=16
    )
    res_f = transport.transport_rounds_fused(
        cfg, photons, frame, idx, t_rem, make_key(5),
        max_rounds=16, inner_rounds=2, s_rows=32, interpret=True,
    )
    a, b = _stats(res_x), _stats(res_f)
    assert b["w"] == pytest.approx(a["w"], rel=1e-6)
    assert b["n_scatt"] == pytest.approx(a["n_scatt"], rel=0.12)
    assert b["ns"] == pytest.approx(a["ns"], rel=0.1)
    # hot electrons inverse-Compton heat the photons; means must track
    assert b["e"] == pytest.approx(a["e"], rel=0.15)
    assert b["r"] == pytest.approx(a["r"], rel=1e-3)


def test_fused_conserves_dead_lanes():
    """Null/padded lanes must pass through the kernel untouched."""
    cfg, photons, frame, idx = _cylindrical_problem(n_min=200, n_max=600)
    # kill half the photons
    n = photons.capacity
    kill = (np.arange(n) % 2) == 0
    photons = photons.replace(weight=photons.weight * jnp.asarray(~kill, jnp.float32))
    t_rem = transport.frame_time(photons, jnp.float32(0.02))
    res = transport.transport_rounds_fused(
        cfg, photons, frame, idx, t_rem, make_key(2),
        max_rounds=8, inner_rounds=2, s_rows=32, interpret=True,
    )
    ph = res.photons
    # dead lanes: identical state, zero scatterings
    np.testing.assert_array_equal(
        np.asarray(ph.p)[kill], np.asarray(photons.p)[kill]
    )
    np.testing.assert_array_equal(
        np.asarray(ph.pos)[kill], np.asarray(photons.pos)[kill]
    )
    np.testing.assert_array_equal(
        np.asarray(ph.num_scatt)[kill], np.asarray(photons.num_scatt)[kill]
    )
    # live lanes moved
    assert int(res.n_scatt) > 0


@pytest.fixture(scope="module")
def f32_tables(tmp_path_factory):
    """Hot cross-section tables (thermal-only and +powerlaw) in float32."""
    from mcrat_tpu.config import NonthermalDist, TauCalculation
    from mcrat_tpu.ops import hot_xsec

    d = tmp_path_factory.mktemp("xsec32")
    cfg_th = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL, dtype="float32",
        simulation_type=SimType.CYLINDRICAL_OUTFLOW,
        tau_calculation=TauCalculation.TABLE,
    )
    cfg_nt = Config(
        dims=Dims.TWO, geometry=Geometry.SPHERICAL, dtype="float32",
        simulation_type=SimType.SPHERICAL_OUTFLOW,
        tau_calculation=TauCalculation.TABLE,
        nonthermal_e_dist=NonthermalDist.POWERLAW,
        powerlaw_index=2.5, gamma_min=1.0, gamma_max=100.0,
    )
    return (
        cfg_th, hot_xsec.load_or_build(cfg_th, str(d / "th.npz"), dtype="float32"),
        cfg_nt, hot_xsec.load_or_build(cfg_nt, str(d / "nt.npz"), dtype="float32"),
    )


def test_fused_table_mode_matches_xla(f32_tables):
    """TABLE-mode hot cross sections through the fused kernel (aux planes +
    stall-on-scatter) agree with the XLA engine in distribution, on a hot
    frame where sigma_hat deviates measurably from Thomson."""
    cfg_th, table, _, _ = f32_tables
    r0e = np.linspace(0.0, 3.2e11, 33)
    r1e = np.linspace(1.8e12, 2.9e12, 65)
    host = frame_from_numpy(cfg_th, make_grid_2d(cfg_th, r0e, r1e))
    apply_simulation_type(host)
    host.temp[:] = 5e8  # theta ~ 0.07: hot sigma_hat < 1 for BB photons
    idx = build_rectilinear_index(r0e, r1e, dtype="float32")
    rng = np.random.default_rng(23)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50, min_photons=1500, max_photons=4000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    t_rem = transport.frame_time(photons, jnp.float32(0.05))
    res_x = transport.transport_rounds(
        cfg_th, photons, frame, idx, t_rem, make_key(9), xsec_table=table,
        max_rounds=16,
    )
    res_f = transport.transport_rounds_fused(
        cfg_th, photons, frame, idx, t_rem, make_key(9), xsec_table=table,
        max_rounds=16, inner_rounds=2, s_rows=32, interpret=True,
    )
    a, b = _stats(res_x), _stats(res_f)
    assert b["w"] == pytest.approx(a["w"], rel=1e-6)
    assert b["n_scatt"] == pytest.approx(a["n_scatt"], rel=0.12)
    assert b["ns"] == pytest.approx(a["ns"], rel=0.12)
    assert b["e"] == pytest.approx(a["e"], rel=0.15)
    assert b["r"] == pytest.approx(a["r"], rel=1e-3)
    # and the hot suppression is real: DIRECT (sigma_hat=1) scatters more
    cfg_dir = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL, dtype="float32",
        simulation_type=SimType.CYLINDRICAL_OUTFLOW,
    )
    res_d = transport.transport_rounds_fused(
        cfg_dir, photons, frame, idx, t_rem, make_key(9),
        max_rounds=16, inner_rounds=2, s_rows=32, interpret=True,
    )
    assert int(res_d.n_scatt) > 1.1 * b["n_scatt"]


def test_fused_nonthermal_matches_xla(f32_tables):
    """Nonthermal (powerlaw) electron populations through the fused kernel:
    biased multi-population selection + in-kernel inverse-CDF gamma draws
    agree with the XLA path."""
    from mcrat_tpu.ops import cyclosynch

    _, _, cfg_nt, table = f32_tables
    host, (re_, te_) = synthetic_spherical_frame(
        cfg_nt, r_min=1e12, r_max=2e13, nr=96, ntheta=16, theta_max=np.pi / 3
    )
    host.nonthermal_dens = cyclosynch.nonthermal_electron_dens(cfg_nt, host)
    assert (host.nonthermal_dens > 0).all()
    idx = build_rectilinear_index(re_, te_, dtype="float32")
    rng = np.random.default_rng(29)
    arrays, _ = transport.inject_photons(
        host, r_inj=4e12, ph_weight=1e50, min_photons=2000, max_photons=6000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 6,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    t_rem = transport.frame_time(photons, jnp.float32(0.3))
    res_x = transport.transport_rounds(
        cfg_nt, photons, frame, idx, t_rem, make_key(13), xsec_table=table,
        max_rounds=20,
    )
    res_f = transport.transport_rounds_fused(
        cfg_nt, photons, frame, idx, t_rem, make_key(13), xsec_table=table,
        max_rounds=20, inner_rounds=2, s_rows=32, interpret=True,
    )
    a, b = _stats(res_x), _stats(res_f)
    assert b["w"] == pytest.approx(a["w"], rel=1e-6)
    assert b["n_scatt"] == pytest.approx(a["n_scatt"], rel=0.15)
    assert b["ns"] == pytest.approx(a["ns"], rel=0.15)
    # gamma<=100 nonthermal electrons upscatter: mean energies must track
    assert b["e"] == pytest.approx(a["e"], rel=0.25)
    assert b["r"] == pytest.approx(a["r"], rel=1e-3)
    assert np.isfinite(np.asarray(res_f.photons.p)).all()


def _grid_3d(kind):
    """A 3-D spherical or polar uniform-outflow problem (float32)."""
    cfg = Config(
        dims=Dims.THREE,
        geometry=Geometry.SPHERICAL if kind == "spherical" else Geometry.POLAR,
        simulation_type=SimType.SPHERICAL_OUTFLOW if kind == "spherical"
        else SimType.CYLINDRICAL_OUTFLOW,
        dtype="float32",
    )
    if kind == "spherical":
        e0 = np.geomspace(1e12, 2e13, 49)       # r
        e1 = np.linspace(1e-3, np.pi / 3, 13)   # theta
        e2 = np.linspace(0.0, 2 * np.pi, 9)     # phi
    else:
        e0 = np.linspace(1e10, 3.2e11, 17)      # r_cyl
        e1 = np.linspace(0.0, 2 * np.pi, 9)     # phi
        e2 = np.linspace(1.8e12, 2.9e12, 33)    # z
    c0 = 0.5 * (e0[:-1] + e0[1:])
    c1 = 0.5 * (e1[:-1] + e1[1:])
    c2 = 0.5 * (e2[:-1] + e2[1:])
    A, B, C = np.meshgrid(c0, c1, c2, indexing="ij")
    DA = np.broadcast_to(np.diff(e0)[:, None, None], A.shape)
    DB = np.broadcast_to(np.diff(e1)[None, :, None], B.shape)
    DC = np.broadcast_to(np.diff(e2)[None, None, :], C.shape)
    n = A.size
    arrays = dict(
        r0=A.ravel(), r1=B.ravel(), r2=C.ravel(),
        dr0=DA.ravel(), dr1=DB.ravel(), dr2=DC.ravel(),
        v0=np.zeros(n), v1=np.zeros(n), v2=np.zeros(n),
        dens=np.ones(n), pres=np.ones(n),
    )
    host = frame_from_numpy(cfg, arrays)
    apply_simulation_type(host)
    idx = build_rectilinear_index(e0, e1, e2, dtype="float32")
    rng = np.random.default_rng(31)
    arrays_ph, _ = transport.inject_photons(
        host, r_inj=3e12 if kind == "spherical" else 2e12, ph_weight=1e50,
        min_photons=1500, max_photons=5000,
        spect=Spectrum.BLACKBODY, theta_min=0.0,
        theta_max=np.pi / 6 if kind == "spherical" else np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays_ph, capacity=None, dtype=jnp.float32)
    return cfg, photons, host.to_device(dtype=jnp.float32), idx


@pytest.mark.parametrize("kind", ["spherical", "polar"])
def test_fused_3d_angular_geometries_match_xla(kind):
    """3-D spherical/polar membership runs atan2-free in the kernel (cosine
    space off the packed sin/cos caches; packed width 24 for spherical) and
    must agree with the XLA engine in distribution."""
    cfg, photons, frame, idx = _grid_3d(kind)
    if kind == "spherical":
        assert frame.packed.shape[0] == 24
    dt = jnp.float32(0.3 if kind == "spherical" else 0.05)
    t_rem = transport.frame_time(photons, dt)
    res_x = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, make_key(21), max_rounds=16
    )
    res_f = transport.transport_rounds_fused(
        cfg, photons, frame, idx, t_rem, make_key(21),
        max_rounds=16, inner_rounds=2, s_rows=32, interpret=True,
    )
    a, b = _stats(res_x), _stats(res_f)
    assert b["w"] == pytest.approx(a["w"], rel=1e-6)
    assert b["n_scatt"] == pytest.approx(a["n_scatt"], rel=0.15)
    assert b["ns"] == pytest.approx(a["ns"], rel=0.15)
    assert b["e"] == pytest.approx(a["e"], rel=0.1)
    assert b["r"] == pytest.approx(a["r"], rel=1e-3)
    assert np.isfinite(np.asarray(res_f.photons.p)).all()


def test_fused_spectrum_agreement():
    """Comptonized spectra from the two engines agree bin by bin."""
    cfg, photons, frame, idx = _cylindrical_problem(n_min=4000, n_max=12000)
    t_rem = transport.frame_time(photons, jnp.float32(0.05))
    res_x = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, make_key(5), max_rounds=10
    )
    res_f = transport.transport_rounds_fused(
        cfg, photons, frame, idx, t_rem, make_key(5),
        max_rounds=10, inner_rounds=2, s_rows=32, interpret=True,
    )
    bins = np.geomspace(1e-4, 1e-1, 16)
    h = []
    for res in (res_x, res_f):
        ph = res.photons
        alive = np.asarray(ph.alive)
        e = np.asarray(ph.p[:, 0])[alive]
        w = np.asarray(ph.weight)[alive]
        hist, _ = np.histogram(e, bins=bins, weights=w)
        h.append(hist / hist.sum())
    # chi-square-ish bin agreement at MC statistics
    for fa, fb in zip(*h):
        if fa > 0.01:
            assert fb == pytest.approx(fa, rel=0.25), (h[0], h[1])
