"""Operating-point sweep for the fused Pallas round kernel on the real chip.

Usage: python tools/sweep_fused.py [inner_rounds ...]
Prints one line per configuration: inner_rounds, s_rows, n_scatt, elapsed,
scatterings/s.  Uses the bench.py problem exactly.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    cache_dir = os.environ.get("MCRAT_TPU_JAX_CACHE", "/tmp/mcrat_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
    from mcrat_tpu.models.analytic import make_grid_2d, apply_simulation_type
    from mcrat_tpu.ops.rng import make_key

    cfg = Config(dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
                 simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float32")
    r0_edges = np.linspace(0.0, 3.2e11, 161)
    r1_edges = np.linspace(1.8e12, 2.9e12, 513)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0_edges, r1_edges))
    apply_simulation_type(host)
    idx = build_rectilinear_index(r0_edges, r1_edges, dtype="float32")
    rng = np.random.default_rng(0)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50,
        min_photons=600_000, max_photons=1_400_000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    dt_max = jnp.float32(0.2)
    t_rem = transport.frame_time(photons, dt_max)

    ks = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    for k in ks:
        for s_rows in (128,):
            res = transport.transport_rounds_fused(
                cfg, photons, frame, idx, t_rem, make_key(0),
                inner_rounds=k, s_rows=s_rows)
            _sync(res)
            t0 = time.perf_counter()
            res = transport.transport_rounds_fused(
                cfg, photons, frame, idx, t_rem, make_key(1),
                inner_rounds=k, s_rows=s_rows)
            _sync(res)
            dt = time.perf_counter() - t0
            n = int(res.n_scatt)
            print(f"inner_rounds={k} s_rows={s_rows} n_scatt={n} "
                  f"n_rounds={int(res.n_rounds)} elapsed={dt:.3f}s "
                  f"rate={n/dt:,.0f}/s", flush=True)


if __name__ == "__main__":
    main()
