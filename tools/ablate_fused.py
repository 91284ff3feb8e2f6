"""Ablation timing of the fused transport loop on the real chip.

Times transport_rounds_fused on the flagship bench problem with individual
glue stages knocked out (monkeypatched) to attribute the per-invocation cost:

  full          complete loop (kernel + search + gather + partition)
  no_partition  active-row partition disabled
  no_search     grid.find_cell_rows -> pass-through (carried rows kept)
  search_only   find_cell_rows does the index search but skips the gather
  gather_only   find_cell_rows gathers rows for the searched cells but the
                search itself is replaced by the cached cell

Run: python tools/ablate_fused.py [n_photons]
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

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mcrat_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from mcrat_tpu import grid as grid_mod
    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
    from mcrat_tpu.models.analytic import apply_simulation_type, make_grid_2d
    from mcrat_tpu.ops.rng import make_key

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cfg = Config(
        dims=Dims.TWO, geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW, dtype="float32",
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
    t_rem = transport.frame_time(photons, jnp.float32(0.2))
    ROUNDS = 48

    real_fcr = grid_mod.find_cell_rows

    def fcr_passthrough(cfg, index, frame, pos, cached, row):
        return cached, row, cached >= 0

    def fcr_search_only(cfg, index, frame, pos, cached, row):
        import mcrat_tpu.geometry as geo

        r0, r1, r2 = geo.mcrat_to_hydro(cfg, pos[..., 0], pos[..., 1], pos[..., 2])
        s_cell = index.find(r0, r1, r2, frame, cached)
        return s_cell, row, s_cell >= 0

    def fcr_gather_only(cfg, index, frame, pos, cached, row):
        safe = jnp.clip(cached, 0, frame.num_elements - 1)
        s_row = frame.packed[:, safe]
        return cached, s_row, cached >= 0

    def run(tag, patch=None, partition=True):
        if patch is not None:
            transport.find_cell_rows_patch = patch
        saved = grid_mod.find_cell_rows
        if patch is not None:
            grid_mod.find_cell_rows = patch

        def call(seed):
            return transport.transport_rounds_fused(
                cfg, photons, frame, idx, t_rem, make_key(seed),
                max_rounds=ROUNDS, partition=partition,
            )

        try:
            res = call(0)
            _sync(res)
            t0 = time.perf_counter()
            reps = 3
            for k in range(reps):
                res = call(k + 1)
                _sync(res)
            dt = (time.perf_counter() - t0) / reps
            n_inv = int(res.n_rounds) / 4
            print(
                f"{tag:14s} {dt*1e3:8.1f} ms/frame-chunk  "
                f"{dt/max(n_inv,1)*1e3:7.2f} ms/invocation  "
                f"(rounds={int(res.n_rounds)}, n_scatt={int(res.n_scatt)})",
                flush=True,
            )
        finally:
            grid_mod.find_cell_rows = saved

    print(f"capacity={photons.capacity}", flush=True)
    run("full")
    run("no_partition", partition=False)
    run("no_search", patch=fcr_passthrough)
    run("search_only", patch=fcr_search_only)
    run("gather_only", patch=fcr_gather_only)


if __name__ == "__main__":
    main()
