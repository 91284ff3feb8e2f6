"""Hydro frame loading dispatch.

Equivalent of getHydroData (reference: Src/mcrat_io.c:1898-1990): builds the
frame filename, dispatches on the configured hydro format, applies the analytic
test-problem overwrite, computes nonthermal electron densities, and (unlike the
reference, which disabled its spatial grid at :1985) builds the device spatial
index that makes photon-cell lookup O(1).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..config import Config, Dims, HydroSim, NonthermalDist, SimType
from ..grid import HydroFrameHost, build_binned_index, build_rectilinear_index
from ..models.analytic import apply_simulation_type
from . import flash, pluto, pluto_chombo, riken


@dataclasses.dataclass
class HydroPaths:
    """File-system layout of the hydro simulation (reference: FILEPATH /
    FILEROOT / MC_PATH macros, Src/mcrat_input.h)."""

    filepath: str = "./"
    fileroot: str = ""
    mc_path: str = "MC/"


def frame_filename(cfg: Config, paths: HydroPaths, frame: int) -> str:
    if cfg.sim_switch is HydroSim.FLASH:
        return flash.flash_frame_name(paths.filepath, paths.fileroot, frame)
    if cfg.sim_switch is HydroSim.PLUTO:
        suffix = "." + cfg.pluto_filetype.value
        return paths.filepath + pluto.pluto_frame_name(paths.fileroot, frame, suffix)
    if cfg.sim_switch is HydroSim.PLUTO_CHOMBO:
        return paths.filepath + pluto.pluto_frame_name(paths.fileroot, frame, ".hdf5")
    if cfg.sim_switch is HydroSim.RIKEN:
        return paths.filepath  # per-variable names are built inside the reader
    raise ValueError(f"no files for {cfg.sim_switch}")


def get_hydro_data(
    cfg: Config,
    paths: HydroPaths,
    frame: int,
    fps: float,
    r_inj: float,
    ph_inj_switch: bool,
    min_r: float = 0.0,
    max_r: float = np.inf,
    min_theta: float = 0.0,
    max_theta: float = np.pi,
    synthetic_frame: Optional[HydroFrameHost] = None,
) -> HydroFrameHost:
    """Load (or synthesize) one hydro frame, post-process, return host frame.

    ``synthetic_frame`` supplies the grid for HydroSim.SYNTHETIC runs (the
    analytic overwrite still runs, so SYNTHETIC + SimType.X == reference
    behavior with no data files).
    """
    if cfg.sim_switch is HydroSim.SYNTHETIC:
        assert synthetic_frame is not None, "SYNTHETIC runs need a synthetic_frame"
        host = synthetic_frame
    elif cfg.sim_switch is HydroSim.FLASH:
        host = flash.read_flash(
            cfg, frame_filename(cfg, paths, frame), fps, r_inj, ph_inj_switch,
            min_r, max_r, min_theta, max_theta,
        )
    elif cfg.sim_switch is HydroSim.PLUTO:
        host = pluto.read_pluto(
            cfg, frame_filename(cfg, paths, frame), fps, r_inj, ph_inj_switch,
            min_r, max_r, min_theta, max_theta,
        )
    elif cfg.sim_switch is HydroSim.PLUTO_CHOMBO:
        host = pluto_chombo.read_pluto_chombo(
            cfg, frame_filename(cfg, paths, frame), fps, r_inj, ph_inj_switch,
            min_r, max_r, min_theta, max_theta,
        )
    elif cfg.sim_switch is HydroSim.RIKEN:
        if cfg.dims is Dims.THREE:
            host = riken.read_riken_3d(
                cfg, paths.filepath, frame, fps, r_inj, ph_inj_switch,
                min_r, max_r,
            )
        else:
            host = riken.read_riken_2d(
                cfg, paths.filepath, frame, fps, r_inj, ph_inj_switch,
                min_r, max_r, min_theta, max_theta,
            )
    else:
        raise ValueError(cfg.sim_switch)

    # analytic test-problem overwrite (reference: Src/mcrat_io.c:1969-1975)
    if cfg.simulation_type is not SimType.SCIENCE:
        apply_simulation_type(host)

    # nonthermal electron densities (reference: Src/mcrat_io.c:1977-1983)
    if cfg.nonthermal_e_dist is not NonthermalDist.OFF:
        from ..ops import cyclosynch

        host.nonthermal_dens = cyclosynch.nonthermal_electron_dens(cfg, host)
    return host


def build_index(cfg: Config, host: HydroFrameHost, edges: Optional[Tuple] = None):
    """Build the device spatial index for a loaded frame.

    Rectilinear (exact, O(log n) searchsorted) when the caller knows the grid
    edges (synthetic grids, full PLUTO grids); otherwise the uniform-bin CSR
    index over the decimated cell list (the reference's SpatialGrid, enabled).
    """
    if edges is not None:
        return build_rectilinear_index(*edges, dtype=cfg.dtype)
    return build_binned_index(host)
