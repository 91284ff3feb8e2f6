"""Golden regression snapshots for the three analytic outflows.

The statistical physics tests re-derive their expectations every run with
loose Monte Carlo tolerances; they cannot see slow drift.  These tests pin
today's physics EXACTLY: fixed numpy seeds + threefry JAX keys on CPU float64
make the transport bit-deterministic, so each case's compact signature
(weighted log-E spectrum, Stokes means, scattering statistics) is compared to
a committed array at 0.1% — tight enough that a deliberate physics
perturbation (e.g. a 1% cross-section change) fails, loose enough to survive
benign float reassociation across JAX versions.

Reference targets: the analytic outflow validation problems at
/root/reference/Src/analytic_outflows.c:7-236 (cylindrical Gamma=100 outflow,
accelerating/coasting spherical fireball, Lundman structured jet) and the
validation methodology in Doc/mcrat_doc.tex:526-566.

Regenerate after an INTENDED physics change: python tools/make_golden.py
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.grid import build_rectilinear_index
from mcrat_tpu.models.analytic import synthetic_spherical_frame
from mcrat_tpu.ops.rng import make_key
from mcrat_tpu import transport

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "cylindrical": dict(sim=SimType.CYLINDRICAL_OUTFLOW, theta_max=np.pi / 4),
    "spherical": dict(sim=SimType.SPHERICAL_OUTFLOW, theta_max=np.pi / 4),
    "structured_jet": dict(
        sim=SimType.STRUCTURED_SPHERICAL_OUTFLOW, theta_max=np.pi / 6
    ),
}


def signature(name: str) -> dict:
    """Deterministic compact signature of one analytic-outflow transport."""
    case = CASES[name]
    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.SPHERICAL, simulation_type=case["sim"],
        dtype="float64",
    )
    host, (r_edges, t_edges) = synthetic_spherical_frame(
        cfg, r_min=5e12, r_max=4e13, nr=96, ntheta=24,
        theta_max=case["theta_max"],
    )
    idx = build_rectilinear_index(r_edges, t_edges, dtype="float64")
    rng = np.random.default_rng(271828)
    arrays, _ = transport.inject_photons(
        host, r_inj=1e13, ph_weight=1e50, min_photons=3000, max_photons=9000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=case["theta_max"] / 2,
        fps=5.0, rng=rng,
    )
    photons, meta = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    frame = host.to_device(dtype=jnp.float64)
    t_rem = transport.frame_time(photons, jnp.float64(0.25))
    res = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, make_key(41, impl="threefry2x32"),
        stokes_on=True, max_rounds=24,
    )
    ph = res.photons
    alive = np.asarray(ph.alive)
    e = np.asarray(ph.p[:, 0])[alive]
    w = np.asarray(ph.weight)[alive]
    s = np.asarray(ph.s)[alive]
    ns = np.asarray(ph.num_scatt)[alive]
    edges = np.linspace(-6.0, 0.0, 25)  # log10 of dimensionless energy
    hist, _ = np.histogram(np.log10(np.maximum(e, 1e-30)), bins=edges, weights=w)
    wsum = w.sum()
    return dict(
        hist=hist / wsum,
        stokes=np.array([
            (s[:, 1] * w).sum() / wsum,
            (s[:, 2] * w).sum() / wsum,
            (s[:, 3] * w).sum() / wsum,
        ]),
        scalars=np.array([
            float((e * w).sum() / wsum),       # mean energy
            float(ns.mean()),                  # mean scatterings
            float(int(res.n_scatt)),           # total scattering events
            float(alive.sum()),                # survivors
        ]),
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_signature(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"golden file missing — generate with: python tools/make_golden.py"
    )
    ref = np.load(path)
    sig = signature(name)
    # spectrum bins: 0.1% of the total weight per bin
    np.testing.assert_allclose(sig["hist"], ref["hist"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(sig["stokes"], ref["stokes"], atol=2e-4, rtol=0)
    np.testing.assert_allclose(sig["scalars"][:2], ref["scalars"][:2], rtol=1e-3)
    # event counts are integers of a deterministic run: exact
    np.testing.assert_array_equal(sig["scalars"][2:], ref["scalars"][2:])
