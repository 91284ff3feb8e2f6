"""Microbenchmark: does INDEX LOCALITY move the 3-D row-gather floor?

The round-4 ablation showed the 3-D glue floor is the per-index element
gather against the 4x-larger cell table (row-count INDEPENDENT: 5-row ultra
14.0 ms vs 16-row packed 13.4 ms), i.e. it is bound by per-index processing
or by random-access locality — two different things with different fixes:

* locality-bound  -> Morton-order the table / sort photons by cell (VERDICT
  r4 next #3a/b) and the gather gets faster;
* per-index-bound -> no reordering can help; the floor is the issue rate and
  the question closes with this measurement.

This measures the SAME gather shape the 3-D bench pays — (5, 262144) table,
1M indices — under index distributions from perfectly coherent to worst-case
random, plus the 2-D table size for scale reference.

Run: python tools/microbench_gather3d.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    import jax.numpy as jnp

    return float(jax.device_get(jnp.sum(x.reshape(-1)[:4096])))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("MCRAT_TPU_JAX_CACHE", "/tmp/mcrat_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    N = 1_048_576
    rng = np.random.default_rng(0)

    @jax.jit
    def gather(tab, idx):
        return tab[:, idx]

    def timeit(tab, idx, reps=20):
        idx = jnp.asarray(idx, jnp.int32)
        out = gather(tab, idx)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = gather(tab, idx)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def gather_rowmajor(tabT, idx):
        return tabT[idx, :]

    @jax.jit
    def gather_rowmajor_t(tabT, idx):
        return tabT[idx, :].T

    def timeit_fn(fn, tab, idx, reps=20):
        idx = jnp.asarray(idx, jnp.int32)
        out = fn(tab, idx)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(tab, idx)
        _sync(out)
        return (time.perf_counter() - t0) / reps

    for nc, label in ((262_144, "3-D 64^3"), (81_920, "2-D 160x512")):
        for w in (5, 16):
            tab = jnp.asarray(rng.standard_normal((w, nc)), jnp.float32)
            tabT = jnp.asarray(np.asarray(tab).T.copy(), jnp.float32)
            rand = rng.integers(0, nc, N)
            srt = np.sort(rand)
            const = np.zeros(N, np.int64)
            # block-coherent: each 128-lane vector hits one random 128-cell
            # neighborhood (what a photon-by-cell sort would produce)
            base = rng.integers(0, max(nc - 128, 1), N // 128)
            block = (base[:, None] + rng.integers(0, 128, (N // 128, 128))).ravel()
            t_r = timeit(tab, rand)
            t_s = timeit(tab, srt)
            t_b = timeit(tab, block)
            t_c = timeit(tab, const)
            print(
                f"{label} w={w:2d}: random {t_r*1e3:6.2f} ms  "
                f"sorted {t_s*1e3:6.2f}  block128 {t_b*1e3:6.2f}  "
                f"const {t_c*1e3:6.2f}   (sorted/random = {t_s/t_r:.2f})"
            )
            # layout / index-count probes: is the plane-major gather streaming
            # the TABLE (cost ~ nc) while a row-major gather is index-bound?
            t_rm = timeit_fn(gather_rowmajor, tabT, rand)
            t_rmt = timeit_fn(gather_rowmajor_t, tabT, rand)
            t_half = timeit(tab, rand[: N // 4])
            print(
                f"        row-major (N,{w}) {t_rm*1e3:6.2f} ms  "
                f"+transpose {t_rmt*1e3:6.2f}  quarter-N plane-major "
                f"{t_half*1e3:6.2f}"
            )


def probe_scaling():
    """Second probe: t(N, NC) model + alternative gather formulations."""
    import jax
    import jax.numpy as jnp

    N = 1_048_576
    rng = np.random.default_rng(1)

    @jax.jit
    def g_plane(tab, idx):
        return tab[:, idx]

    @jax.jit
    def g_1d(row, idx):
        return row[idx]

    @jax.jit
    def g_rows_1d(tab, idx):
        return jnp.stack([tab[i][idx] for i in range(tab.shape[0])])

    def t_of(fn, *args, reps=20):
        out = fn(*args)
        _sync(out if isinstance(out, jnp.ndarray) else out[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out if isinstance(out, jnp.ndarray) else out[0])
        return (time.perf_counter() - t0) / reps

    print("NC sweep at N=1M, w=5 (plane-major):")
    for nc in (32_768, 65_536, 131_072, 262_144, 524_288):
        tab = jnp.asarray(rng.standard_normal((5, nc)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, nc, N), jnp.int32)
        print(f"  NC={nc:7d}: {t_of(g_plane, tab, idx)*1e3:6.2f} ms")
    print("N sweep at NC=262144, w=5 (plane-major):")
    tab = jnp.asarray(rng.standard_normal((5, 262_144)), jnp.float32)
    for n in (131_072, 262_144, 524_288, 1_048_576):
        idx = jnp.asarray(rng.integers(0, 262_144, n), jnp.int32)
        print(f"  N={n:7d}: {t_of(g_plane, tab, idx)*1e3:6.2f} ms")
    print("alternative formulations at N=1M, NC=262144:")
    idx = jnp.asarray(rng.integers(0, 262_144, N), jnp.int32)
    row = tab[0]
    print(f"  one 1-D row gather        : {t_of(g_1d, row, idx)*1e3:6.2f} ms")
    print(f"  5 stacked 1-D row gathers : {t_of(g_rows_1d, tab, idx)*1e3:6.2f} ms")


if __name__ == "__main__":
    if os.environ.get("PROBE2"):
        probe_scaling()
    else:
        main()
