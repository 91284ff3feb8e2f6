"""Microbenchmark: packed-row gather layouts on the real chip.

The fused transport loop's dominant XLA-glue cost is the per-invocation
packed-property gather (16, N) <- packed[:, cell].  This measures the
alternatives:

  A. plane-major gather:   (16, NC)[:, idx]              -> (16, N)
  B. row-major gather:     (NC, 16)[idx, :]  + transpose -> (16, N)
  C. row-major gather, no transpose            -> (N, 16)
  D. searchsorted compare_all (161 + 513 edges) alone
  E. B with width padded to 8-sublane multiple (NC, 16) exact

Run: python tools/microbench_gather.py [N] [NC]
"""
import sys
import time

import numpy as np


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    NC = int(sys.argv[2]) if len(sys.argv) > 2 else 160 * 512
    W = 16
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((W, NC)), jnp.float32)
    packed_t = jnp.asarray(np.asarray(packed).T.copy(), jnp.float32)
    # spatially-coherent indices (photons cluster in nearby cells)
    base = rng.integers(0, NC, size=N // 128)
    idx = (np.repeat(base, 128) + rng.integers(-64, 64, size=N)) % NC
    idx = jnp.asarray(idx, jnp.int32)

    e0 = jnp.asarray(np.linspace(0, 3.2e11, 161), jnp.float32)
    e1 = jnp.asarray(np.linspace(1.8e12, 2.9e12, 513), jnp.float32)
    x0 = jnp.asarray(rng.uniform(0, 3.2e11, N), jnp.float32)
    x1 = jnp.asarray(rng.uniform(1.8e12, 2.9e12, N), jnp.float32)

    A = jax.jit(lambda p, i: p[:, i])
    B = jax.jit(lambda p, i: p[i, :].T)
    C = jax.jit(lambda p, i: p[i, :])

    def srt(p0, p1):
        i = jnp.searchsorted(e0, p0, side="right", method="compare_all")
        j = jnp.searchsorted(e1, p1, side="right", method="compare_all")
        return i * 512 + j

    D = jax.jit(srt)

    def uni(p0, p1):
        i = ((p0 - e0[0]) * (160.0 / (3.2e11))).astype(jnp.int32)
        j = ((p1 - e1[0]) * (512.0 / (2.9e12 - 1.8e12))).astype(jnp.int32)
        return i * 512 + j

    E = jax.jit(uni)

    print(f"N={N} NC={NC} W={W}  (times per call)")
    print(f"A plane-major gather (16,NC)[:,idx]      : {timeit(A, packed, idx)*1e3:8.3f} ms")
    print(f"B row-major gather + T (NC,16)[idx].T    : {timeit(B, packed_t, idx)*1e3:8.3f} ms")
    print(f"C row-major gather     (NC,16)[idx]      : {timeit(C, packed_t, idx)*1e3:8.3f} ms")
    print(f"D searchsorted compare_all 161+513 edges : {timeit(D, x0, x1)*1e3:8.3f} ms")
    print(f"E uniform-grid O(1) index                : {timeit(E, x0, x1)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
