"""Batched physics kernels (the framework's L4 layer).

Each submodule re-designs one reference physics component as pure vectorized
JAX functions over an ``(N,)`` photon axis:

- :mod:`.fourvec` — Lorentz boosts / null-norm (Src/mclib.c:302-434)
- :mod:`.stokes` — Stokes transport machinery (Src/mcrat_scattering.c:10-149)
- :mod:`.compton` — polarized KN scattering (Src/mcrat_scattering.c:151-623)
- :mod:`.electrons` — thermal + nonthermal electron draws (Src/electron.c)
- :mod:`.special` — Bessel K and Maxwell-Juttner pdf (GSL replacements)
- :mod:`.rng` — counter-based batched rejection sampling
"""

from . import compton, electrons, fourvec, rng, special, stokes  # noqa: F401
