"""Counter-based randomness helpers for batched Monte Carlo sampling.

The reference uses per-rank (and per-OpenMP-thread) GSL ranlxs0 streams
(Src/mclib.c:448-462).  Here all sampling is driven by JAX threefry keys, split
per (photon, round) so results are reproducible under any sharding of the
photon axis.

The central utility is :func:`batched_rejection`: the reference's scalar
``while (y > f(x))`` loops (e.g. Src/electron.c:212-223, Src/mcrat_scattering.c:
532-540) become a single ``lax.while_loop`` over the whole batch with a per-lane
acceptance mask — each iteration proposes for every unaccepted lane at once on
the VPU.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def batched_rejection(
    key: jax.Array,
    shape: Tuple[int, ...],
    propose: Callable[[jax.Array], Tuple],
    accept: Callable[..., jax.Array],
    init: Tuple,
    max_iters: int = 256,
):
    """Vectorized rejection sampling.

    Parameters
    ----------
    key: PRNG key.
    shape: batch shape of the sample.
    propose: ``propose(key) -> tuple_of_arrays`` producing candidate draws with
        leading shape ``shape``.
    accept: ``accept(*candidates) -> bool array`` of shape ``shape``.
    init: tuple of fallback arrays (same structure as ``propose`` output) used
        for lanes that never accept within ``max_iters`` (should be a valid,
        physically sane draw).
    max_iters: hard bound on loop trips (safety; acceptance is typically >25%
        per trip so ~40 trips suffice for 1e7 lanes).

    Returns the tuple of accepted arrays.
    """

    def cond(carry):
        i, _key, done, _vals = carry
        return jnp.logical_and(i < max_iters, ~jnp.all(done))

    def body(carry):
        i, key, done, vals = carry
        key, sub = jax.random.split(key)
        cand = propose(sub)
        ok = accept(*cand)
        take = jnp.logical_and(ok, ~done)
        new_vals = tuple(
            jnp.where(_bcast(take, v.ndim - len(shape)), c, v)
            for c, v in zip(cand, vals)
        )
        return i + 1, key, jnp.logical_or(done, ok), new_vals

    done0 = jnp.zeros(shape, dtype=bool)
    _, _, _, vals = jax.lax.while_loop(cond, body, (0, key, done0, tuple(init)))
    return vals


def _bcast(mask, extra_dims: int):
    """Broadcast a ``shape`` mask over trailing vector dims."""
    for _ in range(extra_dims):
        mask = mask[..., None]
    return mask


def uniform_pos(key, shape, dtype):
    """Uniform in (0, 1): strictly positive, like gsl_rng_uniform_pos."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return jnp.maximum(u, jnp.finfo(dtype).tiny)


def isotropic_direction(key, shape, dtype):
    """Isotropic unit vectors: cos(theta) uniform in [-1, 1], phi uniform.

    Matches the injection sampling (reference: Src/mclib.c:225-233).
    Returns (n, 3).
    """
    k1, k2 = jax.random.split(key)
    cos_t = jax.random.uniform(key=k1, shape=shape, dtype=dtype, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(key=k2, shape=shape, dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
