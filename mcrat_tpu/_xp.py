"""Array-namespace dispatch for host/device dual-use math.

Host-side code (readers, injection, merge) works in numpy float64 regardless of
the JAX x64 flag; device code traces through jax.numpy.  Functions shared by
both (geometry transforms, Lorentz boosts) pick their namespace from their
inputs so a numpy call never round-trips through float32 jnp arrays — cell
volumes at GRB radii (r^3 ~ 1e40 cm^3) overflow float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xp_for(*arrays):
    """Return jnp if any input is a JAX array/tracer, else numpy."""
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np
