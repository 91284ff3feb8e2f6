"""Sharded transport on a virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
from mcrat_tpu.grid import build_rectilinear_index
from mcrat_tpu.models.analytic import synthetic_spherical_frame
from mcrat_tpu import transport
from mcrat_tpu.parallel import make_mesh, pad_capacity, shard_photons, sharded_transport_frame
from mcrat_tpu.parallel.mesh import replicate

CFG = Config(
    dims=Dims.TWO,
    geometry=Geometry.SPHERICAL,
    simulation_type=SimType.SPHERICAL_OUTFLOW,
    dtype="float64",
)


def test_sharded_transport_matches_expectations():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    host, (r_edges, t_edges) = synthetic_spherical_frame(
        CFG, r_min=1e12, r_max=2e13, nr=96, ntheta=16, theta_max=np.pi / 3
    )
    idx = build_rectilinear_index(r_edges, t_edges)
    rng = np.random.default_rng(11)
    arrays, w = transport.inject_photons(
        host, r_inj=4e12, ph_weight=1e50, min_photons=400, max_photons=2000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 6,
        fps=5.0, rng=rng,
    )
    mesh = make_mesh()
    cap = pad_capacity(len(arrays["weight"]), mesh.devices.size, factor=1.25)
    ph, meta = transport.photons_from_arrays(arrays, capacity=cap, dtype=jnp.float64)
    ph = shard_photons(ph, mesh)
    frame = replicate(host.to_device(dtype=jnp.float64), mesh)
    idx_r = replicate(idx, mesh)

    res = sharded_transport_frame(
        CFG, mesh, ph, frame, idx_r, 0.2, jax.random.PRNGKey(0)
    )
    out = res.photons
    # population conserved
    np.testing.assert_allclose(
        float(jnp.sum(out.weight)), float(jnp.sum(ph.weight)), rtol=1e-12
    )
    # scattering happened and the count is a replicated global psum
    assert int(res.n_scatt) > 0
    # output keeps the batch sharding
    assert out.p.sharding.spec[0] == "batch"
    # all live photons moved
    alive = np.asarray(out.weight) > 0
    d = np.linalg.norm(np.asarray(out.pos) - np.asarray(ph.pos), axis=1)
    assert (d[alive] > 0).all()


def test_driver_with_mesh(tmp_path):
    """Full driver pass with the photon axis sharded over the 8-device mesh."""
    import os

    from mcrat_tpu.config import McPar
    from mcrat_tpu.driver import default_synthetic_factory, run_rank
    from mcrat_tpu.io.hydro import HydroPaths

    par = McPar(
        fps=5.0, last_frame=12, r0_domain=(1e12, 5e13), r1_domain=(0.0, 1.0),
        r2_domain=(0.0, 0.0), theta_min_deg=0.0, theta_max_deg=6.0,
        n_theta_bins=1, frm0=(10,), frm2=(10,), inj_radius=(8e12,),
        spect=__import__("mcrat_tpu.config", fromlist=["Spectrum"]).Spectrum.BLACKBODY,
        min_photons=300, max_photons=1500, restart="i",
    )
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=96, ntheta=16)
    mesh = make_mesh()
    work = run_rank(
        CFG, par, paths, rank=0, num_ranks=1,
        synthetic_frame_factory=factory, progress=False, mesh=mesh,
    )
    assert os.path.exists(os.path.join(work.mc_dir, "mc_proc_0.h5"))
    import h5py

    with h5py.File(os.path.join(work.mc_dir, "mc_proc_0.h5")) as f:
        frames = sorted(int(k) for k in f.keys())
    assert frames == [10, 11, 12]
