"""Mesh construction and sharded transport.

Replaces the reference's MPI runtime (MPI_Comm_split over angle bins,
block-distributed injection frames, per-thread GSL streams; reference:
Src/mcrat.c:146,457-479, Src/mclib.c:448-462) with a jax.sharding Mesh and
``shard_map`` over the photon axis.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..transport import FrameResult, Photons, frame_time, transport_rounds

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the photon ("batch") axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def pad_capacity(n: int, n_shards: int, factor: float = 1.0) -> int:
    """Round capacity up so each shard gets an equal, nonzero slab."""
    cap = max(int(np.ceil(n * factor)), n_shards)
    return int(np.ceil(cap / n_shards) * n_shards)


def shard_photons(photons: Photons, mesh: Mesh) -> Photons:
    """Place the photon SoA with the leading axis sharded over the mesh."""
    def put(x):
        spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, photons)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (hydro frame, spatial index) across the mesh."""
    def put(x):
        if isinstance(x, jax.Array) or isinstance(x, np.ndarray):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree_util.tree_map(put, tree)


def sharded_transport_frame(
    cfg: Config,
    mesh: Mesh,
    photons: Photons,
    frame,
    index,
    dt_max,
    key,
    xsec_table=None,
    stokes_on: bool = True,
) -> FrameResult:
    """Transport one hydro frame with the photon axis sharded over ``mesh``.

    Each shard runs its own transport while_loop to completion — shards in
    low-scattering regions finish early without synchronizing each round,
    exactly like MCRaT ranks running ahead of each other between frame
    barriers.  The per-frame scattering count is psum-reduced (the analogue of
    the reference's frame_scatt_cnt log line, Src/mcrat.c:810-817).
    """
    n_shards = mesh.devices.size
    if photons.capacity % n_shards:
        raise ValueError(
            f"photon capacity {photons.capacity} not divisible by mesh size {n_shards}; "
            "use pad_capacity()"
        )
    pspec = jax.tree_util.tree_map(lambda x: P(BATCH_AXIS, *([None] * (x.ndim - 1))), photons)
    rspec = jax.tree_util.tree_map(lambda _: P(), frame)
    ispec = jax.tree_util.tree_map(lambda _: P(), index)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pspec, rspec, ispec, P(), P(BATCH_AXIS)),
        out_specs=FrameResult(photons=pspec, n_scatt=P(), n_rounds=P()),
        # The transport while_loop mixes device-varying carries (photon state,
        # per-shard keys) with unvarying literals; skip the vma consistency
        # checker rather than pvary-annotating every rejection-sampler carry.
        check_vma=False,
    )
    def step(ph_shard, frame_rep, index_rep, dt, keys):
        res = transport_rounds(
            cfg, ph_shard, frame_rep, index_rep, frame_time(ph_shard, dt), keys[0],
            xsec_table=xsec_table, stokes_on=stokes_on,
        )
        return FrameResult(
            photons=res.photons,
            n_scatt=jax.lax.psum(res.n_scatt, BATCH_AXIS),
            n_rounds=jax.lax.pmax(res.n_rounds, BATCH_AXIS),
        )

    keys = jax.random.split(key, n_shards)
    return step(photons, frame, index, jnp.asarray(dt_max), keys)
