"""Ablation timing of the transport round body on the real chip.

Times transport_rounds on the bench problem with individual stages disabled
(via monkeypatching) to attribute the per-round cost.  Run on TPU:

    python tools/ablate_transport.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_target=1_000_000):
    import jax
    import jax.numpy as jnp

    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
    from mcrat_tpu.models.analytic import make_grid_2d, apply_simulation_type

    cfg = Config(
        dims=Dims.TWO,
        geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW,
        dtype="float32",
    )
    r0_edges = np.linspace(0.0, 3.2e11, 161)
    r1_edges = np.linspace(1.8e12, 2.9e12, 513)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0_edges, r1_edges))
    apply_simulation_type(host)
    idx = build_rectilinear_index(r0_edges, r1_edges, dtype="float32")
    rng = np.random.default_rng(0)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50,
        min_photons=int(n_target * 0.6), max_photons=int(n_target * 1.4),
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    return cfg, photons, frame, idx


def time_rounds(cfg, photons, frame, idx, n_rounds=16, stokes_on=True, reps=3):
    import jax
    import jax.numpy as jnp

    from mcrat_tpu import transport

    t_rem = transport.frame_time(photons, jnp.float32(0.2))
    from mcrat_tpu.ops.rng import make_key
    key = make_key(0)
    # warm-up / compile
    res = transport.transport_rounds(
        cfg, photons, frame, idx, t_rem, key, stokes_on=stokes_on, max_rounds=n_rounds
    )
    _sync(res)
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        res = transport.transport_rounds(
            cfg, photons, frame, idx, t_rem, make_key(r + 1),
            stokes_on=stokes_on, max_rounds=n_rounds,
        )
        _sync(res)
        best = min(best, time.perf_counter() - t0)
    n = photons.capacity
    per = best / (n * int(res.n_rounds)) * 1e9
    return best, per, int(res.n_scatt), int(res.n_rounds)


def _sync(x):
    """Force REAL completion: on the axon tunnel backend block_until_ready
    can return at dispatch completion, which made every round-3 microbench
    number bogus (a full-frame fused call "measured" 0.6 ms).  A device_get
    of a reduction is an actual data readback and cannot lie."""
    import jax
    import jax.numpy as jnp

    leaf = x
    if hasattr(x, "state"):
        leaf = x.state
    elif hasattr(x, "photons"):
        leaf = x.photons.p
    if isinstance(leaf, (list, tuple)):
        leaf = leaf[0]
    return float(jax.device_get(jnp.sum(leaf.reshape(-1)[:4096])))


def main():
    import jax

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cfg, photons, frame, idx = build()
    n = photons.capacity
    print(f"photons: {n}", flush=True)

    variants = {}

    # full
    best, per, ns, nr = time_rounds(cfg, photons, frame, idx)
    variants["full"] = per
    print(f"full:                 {best*1e3:8.2f} ms  {per:6.2f} ns/(ph*round)  scatt={ns} rounds={nr}", flush=True)

    # no stokes
    best, per, ns, nr = time_rounds(cfg, photons, frame, idx, stokes_on=False)
    variants["no_stokes"] = per
    print(f"no_stokes:            {best*1e3:8.2f} ms  {per:6.2f} ns/(ph*round)  scatt={ns}", flush=True)

    # ablate the scatter kernel: replace single_scatter with pass-through
    from mcrat_tpu.ops import compton

    orig_scatter = compton.single_scatter

    def fake_scatter(key, el_p, ph_p, s, stokes_on=True):
        import jax.numpy as jnp
        return compton.ScatterResult(
            ph_p=ph_p, s=s, scattered=jnp.ones(ph_p.shape[0], bool)
        )

    import mcrat_tpu.transport as T
    T.compton.single_scatter = fake_scatter
    try:
        T.transport_rounds.clear_cache()
        best, per, ns, nr = time_rounds(cfg, photons, frame, idx)
        variants["no_scatter_kernel"] = per
        print(f"no_scatter_kernel:    {best*1e3:8.2f} ms  {per:6.2f} ns/(ph*round)", flush=True)
    finally:
        T.compton.single_scatter = orig_scatter

    # ablate electron sampling
    from mcrat_tpu.ops import electrons
    orig_el = electrons.sample_thermal_electron

    def fake_el(key, temp, comv_p):
        import jax.numpy as jnp
        n = comv_p.shape[0]
        out = jnp.zeros((n, 4), comv_p.dtype)
        return out.at[:, 0].set(1.0)

    T.electrons.sample_thermal_electron = fake_el
    try:
        T.transport_rounds.clear_cache()
        best, per, ns, nr = time_rounds(cfg, photons, frame, idx)
        variants["no_electron_sample"] = per
        print(f"no_electron_sample:   {best*1e3:8.2f} ms  {per:6.2f} ns/(ph*round)", flush=True)
    finally:
        T.electrons.sample_thermal_electron = orig_el

    # ablate cell search (keep cached row always)
    from mcrat_tpu import grid as G
    orig_fcr = G.find_cell_rows

    def fake_fcr(cfg, index, frame, pos, cached, row):
        import jax.numpy as jnp
        return cached, row, cached >= 0

    T.find_cell_rows_orig = orig_fcr
    import mcrat_tpu.grid
    mcrat_tpu.grid.find_cell_rows = fake_fcr
    try:
        T.transport_rounds.clear_cache()
        best, per, ns, nr = time_rounds(cfg, photons, frame, idx)
        variants["no_cell_search"] = per
        print(f"no_cell_search:       {best*1e3:8.2f} ms  {per:6.2f} ns/(ph*round)", flush=True)
    finally:
        mcrat_tpu.grid.find_cell_rows = orig_fcr

    T.transport_rounds.clear_cache()
    print("\nattribution (ns/photon-round):")
    full = variants["full"]
    for k, v in variants.items():
        if k == "full":
            continue
        print(f"  {k:22s} {full - v:6.2f}")


if __name__ == "__main__":
    main()
