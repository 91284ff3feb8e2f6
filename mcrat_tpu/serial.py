"""Serial-equivalent transport: the reference's exact event ordering.

The batched engine (mcrat_tpu.transport) advances every photon through its own
free-path chain concurrently; the reference instead globally orders events:
sample *all* free paths, walk candidates from the smallest, advance the whole
population to each candidate's time, scatter that single photon, then resample
everything (Src/mclib.c:617-714, 1107-1356).  The two are equivalent in
distribution (exponential memorylessness); this module implements the
reference ordering directly — O(N) work per event, host-driven — as the
validation oracle for that claim (SURVEY.md section 7 "serial-equivalence
mode") and as a debugging tool for small populations.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, PhotonType
from .constants import C_LIGHT
from .grid import find_cell
from .ops import compton, electrons
from .ops.fourvec import lorentz_boost
from .ops.stokes import stokes_rotation
from .transport import DEFAULT_MFP, Photons, _tau_rate


class SerialResult(NamedTuple):
    photons: Photons
    n_scatt: int
    n_events_attempted: int


def transport_frame_serial(
    cfg: Config,
    photons: Photons,
    frame,
    index,
    dt_max: float,
    key,
    xsec_table=None,
    stokes_on: bool = True,
    max_events: int = 10_000_000,
) -> SerialResult:
    """One frame window with the reference's global-min-time event loop."""
    rng_key = key
    t_remaining = float(dt_max)
    n_scatt = 0
    attempts = 0

    while t_remaining > 0 and attempts < max_events:
        rng_key, k_mfp, k_el, k_sc = jax.random.split(rng_key, 4)
        # 1. cells + rates + free paths for everyone (calcMeanFreePath)
        cell, _ = find_cell(cfg, index, frame, photons.pos, photons.cell)
        photons = photons.replace(cell=cell)
        rate, fluid_beta, _aux = _tau_rate(cfg, frame, photons, cell, xsec_table)
        comv = lorentz_boost(fluid_beta, photons.p, photon=True)
        alive = np.asarray(photons.alive)
        in_grid = np.asarray(cell) >= 0
        u = np.asarray(jax.random.uniform(k_mfp, (photons.capacity,), dtype=photons.p.dtype))
        u = np.maximum(u, np.finfo(np.float64).tiny)
        mfp = np.where(in_grid, -np.log(u) / np.maximum(np.asarray(rate), 1e-300), DEFAULT_MFP)
        t_scatt = mfp / C_LIGHT
        t_scatt = np.where(alive, t_scatt, np.inf)

        # 2. walk candidates in time order (photonEvent)
        order = np.argsort(t_scatt)
        consumed = 0.0
        event_done = False
        for idx in order:
            attempts += 1
            t_cand = float(t_scatt[idx])
            if t_cand >= t_remaining or not np.isfinite(t_cand):
                # advance everyone to the frame boundary and finish
                photons = _advance_all(photons, t_remaining - consumed)
                consumed = t_remaining
                event_done = True
                break
            # advance ALL photons to this candidate's time
            photons = _advance_all(photons, t_cand - consumed)
            consumed = t_cand
            # attempt the single scattering
            photons, ok = _attempt_one(
                cfg, photons, frame, int(idx), fluid_beta, comv,
                jax.random.fold_in(k_sc, int(idx)), stokes_on,
            )
            if ok:
                n_scatt += 1
                event_done = True
                break
        t_remaining -= consumed
        if not event_done:
            break
    return SerialResult(photons=photons, n_scatt=n_scatt, n_events_attempted=attempts)


def _advance_all(photons: Photons, dt: float) -> Photons:
    if dt <= 0:
        return photons
    moves = photons.alive & (photons.ptype != PhotonType.CS_POOL)
    inv_p0 = 1.0 / jnp.maximum(photons.p[:, 0], 1e-300)
    step = photons.p[:, 1:] * inv_p0[:, None] * (C_LIGHT * dt)
    return photons.replace(pos=jnp.where(moves[:, None], photons.pos + step, photons.pos))


def _attempt_one(cfg, photons, frame, idx, fluid_beta, comv, key, stokes_on):
    """Attempt the scattering of photon ``idx`` (photonEvent inner step)."""
    k_el, k_sc = jax.random.split(key)
    sl = slice(idx, idx + 1)
    comv_i = comv[sl]
    beta_i = fluid_beta[sl]
    s_i = photons.s[sl]
    if stokes_on:
        s_i = stokes_rotation(beta_i, photons.p[sl, 1:], comv_i[:, 1:], s_i)
    safe = jnp.clip(photons.cell[sl], 0, frame.num_elements - 1)
    temp = frame.temp[safe]
    el = electrons.sample_thermal_electron(k_el, temp, comv_i)
    res = compton.single_scatter(k_sc, el, comv_i, s_i, stokes_on=stokes_on)
    if not bool(res.scattered[0]):
        return photons, False
    new_lab = lorentz_boost(-beta_i, res.ph_p, photon=True)
    if stokes_on:
        s_new = stokes_rotation(-beta_i, res.ph_p[:, 1:], new_lab[:, 1:], res.s)
    else:
        s_new = res.s
    is_pool = photons.ptype[idx] == int(PhotonType.CS_POOL)
    new_type = jnp.where(is_pool, int(PhotonType.COMPTONIZED), photons.ptype[idx])
    photons = photons.replace(
        p=photons.p.at[sl].set(new_lab),
        comv_p=photons.comv_p.at[sl].set(res.ph_p),
        s=photons.s.at[sl].set(s_new),
        num_scatt=photons.num_scatt.at[idx].add(1.0),
        ptype=photons.ptype.at[idx].set(new_type),
    )
    return photons, True
