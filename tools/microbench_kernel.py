"""Microbenchmark: in-kernel cost attribution for the fused round kernel.

Times ONE fused_rounds invocation (all lanes active, bench.py's flagship
problem) under static-arg variations, so per-feature cost is visible:

    stokes on/off, kn_iters, el_iters, inner_rounds

Run: python tools/microbench_kernel.py
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
    import jax.numpy as jnp

    cache_dir = os.environ.get("MCRAT_TPU_JAX_CACHE", "/tmp/mcrat_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy, gather_rows
    from mcrat_tpu.models.analytic import apply_simulation_type, make_grid_2d
    from mcrat_tpu.ops import pallas_round as pr

    cfg = Config(dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
                 simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float32")
    r0_edges = np.linspace(0.0, 3.2e11, 161)
    r1_edges = np.linspace(1.8e12, 2.9e12, 513)
    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0_edges, r1_edges))
    apply_simulation_type(host)
    build_rectilinear_index(r0_edges, r1_edges, dtype="float32")
    rng = np.random.default_rng(0)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50,
        min_photons=600_000, max_photons=1_400_000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    cap = photons.capacity
    lanes = pr.LANES
    s_rows = 128
    r_raw = -(-cap // lanes)
    r_pad = -(-r_raw // s_rows) * s_rows
    n_pad = r_pad * lanes

    def plane(x, fill=0.0):
        return jnp.pad(x.astype(jnp.float32), (0, n_pad - cap),
                       constant_values=fill).reshape(r_pad, lanes)

    t_rem = jnp.full((cap,), 0.2, jnp.float32)
    state = jnp.stack([
        plane(photons.p[:, 0]), plane(photons.p[:, 1]),
        plane(photons.p[:, 2]), plane(photons.p[:, 3]),
        plane(photons.pos[:, 0]), plane(photons.pos[:, 1]), plane(photons.pos[:, 2]),
        plane(photons.s[:, 1]), plane(photons.s[:, 2]), plane(photons.s[:, 3]),
        plane(t_rem), plane(photons.num_scatt),
        plane(photons.comv_p[:, 0]), plane(photons.comv_p[:, 1]),
        plane(photons.comv_p[:, 2]), plane(photons.comv_p[:, 3]),
    ])
    cell0 = jnp.pad(photons.cell, (0, n_pad - cap), constant_values=-1)
    rows = gather_rows(frame, cell0).reshape(-1, r_pad, lanes)
    alive0 = plane(photons.alive.astype(jnp.float32)) > 0
    flags = (alive0.astype(jnp.int32) * pr.FLAG_ALIVE
             + alive0.astype(jnp.int32) * pr.FLAG_INGRID)[None]
    dom = frame.domain.reshape(-1)
    seed = jnp.asarray([12345, r_pad // s_rows], jnp.int32)

    def timeit(reps=10, **kw):
        def call(s):
            return pr.fused_rounds(cfg, seed + s, dom, state, rows, flags,
                                   s_rows=s_rows, **kw)
        out = call(0)
        _sync(out)
        t0 = time.perf_counter()
        for k in range(reps):
            out = call(k)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    base = dict(stokes_on=True, inner_rounds=4, el_iters=12, kn_iters=16)
    variants = [
        ("base (stokes, k4, el12, kn16)", base),
        ("stokes off", dict(base, stokes_on=False)),
        ("kn_iters=8", dict(base, kn_iters=8)),
        ("kn_iters=4", dict(base, kn_iters=4)),
        ("kn_iters=1", dict(base, kn_iters=1)),
        ("el_iters=4", dict(base, el_iters=4)),
        ("inner_rounds=8", dict(base, inner_rounds=8)),
        ("inner_rounds=2", dict(base, inner_rounds=2)),
    ]
    print(f"cap={cap} r_pad={r_pad} (times per invocation; base = 4 rounds)")
    for tag, kw in variants:
        dt = timeit(**kw)
        per_round = dt / kw["inner_rounds"] * 1e3
        print(f"{tag:32s}: {dt*1e3:8.2f} ms  ({per_round:6.2f} ms/round)")


if __name__ == "__main__":
    main()
