"""Ablation: where does the shard_map single-device tax go?

BENCH_r04 measured the mesh(1) sharded frame 10-26% slower than the direct
path — the only multi-chip perf proxy this environment can produce, and the
per-chip multiplier a real pod would pay everywhere.  This decomposes the
per-chunk cost difference:

  direct          transport_rounds_fused, chained chunks (production shape)
  sharded         _sharded_chunk on mesh(1) with the production per-chunk
                  eager jax.random.split (exactly what step_fn does)
  sharded_presplit  same, keys precomputed once -> isolates the eager split
                  dispatch that the direct path does not pay
  sharded_nored   shard_map WITHOUT the psum/pmax scalar reductions ->
                  isolates the collective + scalar-output cost
  reshard         shard_photons + t_rem device_put of a quarter-size buffer
                  (the per-compaction rebalance cost the direct path skips)

Run: python tools/ablate_mesh.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    """Force REAL completion (axon tunnel: block_until_ready can return at
    dispatch completion; a device_get of a reduction cannot lie)."""
    import jax
    import jax.numpy as jnp

    leaf = x
    if hasattr(x, "photons"):
        leaf = x.photons.p
    if isinstance(leaf, (list, tuple)):
        leaf = leaf[0]
    return float(jax.device_get(jnp.sum(leaf.reshape(-1)[:4096])))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cache_dir = os.environ.get("MCRAT_TPU_JAX_CACHE", "/tmp/mcrat_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index, frame_from_numpy
    from mcrat_tpu.models.analytic import apply_simulation_type, make_grid_2d
    from mcrat_tpu.ops.rng import make_key
    from mcrat_tpu.parallel import make_mesh, shard_photons
    from mcrat_tpu.parallel.mesh import (
        BATCH_AXIS, _pspec_like, _rep_spec, _sharded_chunk, replicate,
    )

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
    photons, _ = transport.photons_from_arrays(arrays, capacity=None,
                                               dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    # keep every lane active for the whole chain: per-chunk steady-state cost
    t_big = jnp.full((photons.capacity,), 100.0, jnp.float32)
    ROUNDS = 8   # rounds per chunk
    CHAIN = 8    # chunks per sample (state chained -> no async overlap lies)
    REPS = 5

    mesh1 = make_mesh(1)
    ph_sh = shard_photons(photons, mesh1)
    frame_sh = replicate(frame, mesh1)
    idx_sh = replicate(idx, mesh1)
    t_sh = jax.device_put(t_big, NamedSharding(mesh1, P(BATCH_AXIS)))
    xsec_arg = jnp.zeros((), jnp.float32)
    xsec_sh = replicate(xsec_arg, mesh1)

    def run_direct(key):
        ph, t = photons, t_big
        for _ in range(CHAIN):
            key, sub = jax.random.split(key)
            res = transport.transport_rounds_fused(
                cfg, ph, frame, idx, t, sub, stokes_on=True, max_rounds=ROUNDS,
            )
            ph, t = res.photons, res.t_rem
        return res

    def run_sharded(key):
        # production (round-5): ONE key into the jit, per-shard split inside
        ph, t = ph_sh, t_sh
        for _ in range(CHAIN):
            key, sub = jax.random.split(key)
            res = _sharded_chunk(
                cfg, mesh1, ph, frame_sh, idx_sh, xsec_sh, t, sub,
                stokes_on=True, max_rounds=ROUNDS, use_fused=True,
                interpret=False, s_rows=128, inner_rounds=4, has_xsec=False,
            )
            ph, t = res.photons, res.t_rem
        return res

    def run_sharded_eagersplit(key):
        # the round-4 production path: an EXTRA eager split per chunk on the
        # critical path (this was the whole mesh tax — kept as the regression
        # guard for the finding)
        ph, t = ph_sh, t_sh
        for _ in range(CHAIN):
            key, sub = jax.random.split(key)
            sub = jax.random.split(sub, 1)[0]
            res = _sharded_chunk(
                cfg, mesh1, ph, frame_sh, idx_sh, xsec_sh, t, sub,
                stokes_on=True, max_rounds=ROUNDS, use_fused=True,
                interpret=False, s_rows=128, inner_rounds=4, has_xsec=False,
            )
            ph, t = res.photons, res.t_rem
        return res

    keys_pre = [
        jax.device_put(jax.random.split(make_key(7 + i), 1),
                       NamedSharding(mesh1, P(BATCH_AXIS)))
        for i in range(CHAIN)
    ]

    # shard_map WITHOUT the psum/pmax reductions: photons + t_rem out only
    pspec = _pspec_like(ph_sh)

    @functools.partial(jax.jit, static_argnames=())
    def _chunk_nored(ph_s, frame_rep, index_rep, t_s, keys_s):
        @functools.partial(
            jax.shard_map, mesh=mesh1,
            in_specs=(pspec, _rep_spec(frame_sh), _rep_spec(idx_sh),
                      P(BATCH_AXIS), P(BATCH_AXIS)),
            out_specs=(pspec, P(BATCH_AXIS)),
            check_vma=False,
        )
        def step(ph_shard, frame_rep, index_rep, t_shard, keys_shard):
            res = transport.transport_rounds_fused(
                cfg, ph_shard, frame_rep, index_rep, t_shard, keys_shard[0],
                stokes_on=True, max_rounds=ROUNDS,
            )
            return res.photons, res.t_rem

        return step(ph_s, frame_rep, index_rep, t_s, keys_s)

    def run_sharded_nored(_key):
        ph, t = ph_sh, t_sh
        for i in range(CHAIN):
            ph, t = _chunk_nored(ph, frame_sh, idx_sh, t, keys_pre[i])
        return ph.p

    def timeit(fn, seed, reps=REPS):
        out = fn(make_key(seed))
        _sync(out)
        samples = []
        for r in range(reps):
            t0 = time.perf_counter()
            out = fn(make_key(seed + 1 + r))
            _sync(out)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[len(samples) // 2] / CHAIN

    t_direct = timeit(run_direct, 100)
    t_shard = timeit(run_sharded, 200)
    t_eager = timeit(run_sharded_eagersplit, 300)
    t_nored = timeit(run_sharded_nored, 400)

    # per-compaction reshard cost: quarter-size buffer re-placement
    quarter = transport.compact_live(photons, transport._pow2(photons.capacity // 4))
    t_q = jnp.full((quarter.capacity,), 1.0, jnp.float32)

    def do_reshard(_):
        ph2 = shard_photons(quarter, mesh1)
        t2 = jax.device_put(t_q, NamedSharding(mesh1, P(BATCH_AXIS)))
        return ph2.p + t2[:, None] * 0

    r0 = do_reshard(None)
    _sync(r0)
    t0 = time.perf_counter()
    for _ in range(10):
        r0 = do_reshard(None)
    _sync(r0)
    t_reshard = (time.perf_counter() - t0) / 10

    cap = photons.capacity
    print(f"cap={cap} rounds/chunk={ROUNDS} chain={CHAIN} (median of {REPS})")
    print(f"direct chunk                : {t_direct*1e3:8.2f} ms")
    print(f"sharded chunk (production)  : {t_shard*1e3:8.2f} ms   "
          f"tax {100*(t_shard/t_direct-1):+.1f}%")
    print(f"sharded, r4 eager split     : {t_eager*1e3:8.2f} ms   "
          f"eager-split cost {1e3*(t_eager-t_shard):+.2f} ms/chunk")
    print(f"sharded, no reductions      : {t_nored*1e3:8.2f} ms   "
          f"psum/scalars cost {1e3*(t_shard-t_nored):+.2f} ms/chunk")
    print(f"shard_map floor vs direct   : {1e3*(t_nored-t_direct):+.2f} ms/chunk")
    print(f"reshard quarter buffer      : {t_reshard*1e3:8.2f} ms per compaction")


if __name__ == "__main__":
    main()
