"""Microbenchmark: XLA glue stages of the fused transport loop body.

transport_rounds_fused's while-loop body = partition + find_cell_rows +
flags/pos packing + fused kernel.  The isolated kernel costs ~6.4 ms but the
loop pays ~13.3 ms per invocation; this times each glue stage as a separate
jitted function on the bench-size state to find the difference.

Run: python tools/microbench_glue.py
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
    from mcrat_tpu.grid import (build_rectilinear_index, find_cell_rows,
                                frame_from_numpy, gather_rows)
    from mcrat_tpu.models.analytic import apply_simulation_type, make_grid_2d
    from mcrat_tpu.ops import pallas_round as pr

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
    rows = gather_rows(frame, cell0)
    rows3 = rows.reshape(-1, r_pad, lanes)
    n_prow = rows.shape[0]
    alive = plane(photons.alive.astype(jnp.float32)) > 0
    pool = jnp.zeros((r_pad, lanes), bool)

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def do_partition(state, rows, cell, alive, pool):
        act_row = jnp.any(alive & (state[pr.SP_TREM] > 0), axis=1)
        n_act = jnp.sum(act_row.astype(jnp.int32))
        ca = jnp.cumsum(act_row.astype(jnp.int32))
        ci = jnp.cumsum(jnp.logical_not(act_row).astype(jnp.int32))
        new_pos = jnp.where(act_row, ca - 1, n_act + ci - 1)
        iota = jnp.arange(r_pad, dtype=jnp.int32)
        perm = jnp.zeros((r_pad,), jnp.int32).at[new_pos].set(iota)
        state = state[:, perm]
        rows = rows.reshape(n_prow, r_pad, lanes)[:, perm].reshape(n_prow, n_pad)
        cell = cell.reshape(r_pad, lanes)[perm].reshape(-1)
        return state, rows, cell, alive[perm], pool[perm]

    @jax.jit
    def do_search(state, rows, cell):
        pos = jnp.stack([
            state[pr.SP_X].reshape(-1), state[pr.SP_Y].reshape(-1),
            state[pr.SP_Z].reshape(-1),
        ], axis=-1)
        return find_cell_rows(cfg, idx, frame, pos, cell, rows)

    @jax.jit
    def do_flags(state, alive, pool, in_grid):
        return (
            alive.astype(jnp.int32) * pr.FLAG_ALIVE
            + pool.astype(jnp.int32) * pr.FLAG_POOL
            + in_grid.reshape(r_pad, lanes).astype(jnp.int32) * pr.FLAG_INGRID
        )[None]

    in_grid = jnp.ones((n_pad,), bool)
    flags = do_flags(state, alive, pool, in_grid)
    dom = frame.domain.reshape(-1)
    seed = jnp.asarray([12345, r_pad // s_rows], jnp.int32)

    def do_kernel(state, rows3, flags):
        return pr.fused_rounds(cfg, seed, dom, state, rows3, flags,
                               s_rows=s_rows)

    t_part = timeit(do_partition, state, rows, cell0, alive, pool)
    t_search = timeit(do_search, state, rows, cell0)
    t_flags = timeit(do_flags, state, alive, pool, in_grid)
    t_kern = timeit(lambda s: do_kernel(s, rows3, flags), state)

    print(f"cap={cap} r_pad={r_pad}")
    print(f"partition (state+rows perm) : {t_part*1e3:8.2f} ms")
    print(f"find_cell_rows              : {t_search*1e3:8.2f} ms")
    print(f"flags build                 : {t_flags*1e3:8.2f} ms")
    print(f"kernel (4 rounds)           : {t_kern*1e3:8.2f} ms")
    print(f"sum                         : {(t_part+t_search+t_flags+t_kern)*1e3:8.2f} ms"
          f"  (loop measures ~13.3)")


if __name__ == "__main__":
    main()
