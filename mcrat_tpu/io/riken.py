"""RIKEN legacy hydro reader (Fortran unformatted binaries).

Re-design of the 2-D path of Src/mclib_riken.c (readHydro2D, :55-418): the
frame consists of per-variable files ``{prefix}u0{N}-{frame:04d}small.data``
(u01 = density, u02 = radial velocity, u03 = polar velocity, u08 = pressure)
each with a Fortran record header (1 float) + six int32 slice indexes
(phi/theta/r min-max, 1-based) + two floats, followed by float32 data with r
fastest; the spherical grid comes from comma-separated text files
``grid-x1.data`` (r) and ``grid-x2.data`` (theta).

The reference's 3-D variant (read_hydro, :419-944) with its 7-segment radial
remapping and special frame schedule (increment 10 and fps -> 1 beyond frame
3000, Src/mcrat.c:551-562) is represented by the frame-schedule abstraction in
the driver; the 3-D binary reader follows the same per-variable layout.
"""
from __future__ import annotations

import numpy as np

from ..config import Config
from ..grid import HydroFrameHost, frame_from_numpy
from .decimate import decimation_mask


def riken_frame_prefix(prefix: str, var: int, frame: int) -> str:
    """{prefix}u0{var}-{frame:04d}small.data (reference: mclib_riken.c:79-87)."""
    return f"{prefix}u0{var}-{frame:04d}small.data"


def _read_riken_var(path: str):
    """One variable file -> (slice indexes, float32 data)."""
    with open(path, "rb") as f:
        raw = f.read()
    head = np.frombuffer(raw, dtype=np.int32, count=7, offset=0)
    # head[0] is the Fortran record marker; next six are 1-based indexes:
    # phi_min, phi_max, theta_min, theta_max, r_min, r_max
    idx = head[1:7].astype(np.int64) - 1
    # two floats follow the indexes (reference: mclib_riken.c:126-127)
    data_off = 4 * (7 + 2)
    t_lo, t_hi, r_lo, r_hi = idx[2], idx[3], idx[4], idx[5]
    elem = int((r_hi + 1 - r_lo) * (t_hi + 1 - t_lo))
    data = np.frombuffer(raw, dtype=np.float32, count=elem, offset=data_off)
    return (t_lo, t_hi, r_lo, r_hi), np.asarray(data, dtype=np.float64)


def _read_grid_axis(path: str) -> np.ndarray:
    txt = open(path).read().replace(",", " ")
    return np.fromstring(txt, sep=" ") if hasattr(np, "fromstring") else np.fromiter(
        (float(x) for x in txt.split()), dtype=np.float64
    )


def read_riken_2d(
    cfg: Config,
    prefix: str,
    frame: int,
    fps: float,
    r_inj: float,
    ph_inj_switch: bool,
    min_r: float = 0.0,
    max_r: float = np.inf,
    min_theta: float = 0.0,
    max_theta: float = np.pi,
) -> HydroFrameHost:
    (t_lo, t_hi, r_lo, r_hi), dens = _read_riken_var(riken_frame_prefix(prefix, 1, frame))
    _, vel_r = _read_riken_var(riken_frame_prefix(prefix, 2, frame))
    _, vel_t = _read_riken_var(riken_frame_prefix(prefix, 3, frame))
    _, pres = _read_riken_var(riken_frame_prefix(prefix, 8, frame))

    r_all = _read_grid_axis(f"{prefix}grid-x1.data")
    t_all = _read_grid_axis(f"{prefix}grid-x2.data")
    r = r_all[r_lo : r_hi + 1]
    th = t_all[t_lo : t_hi + 1]
    dr = np.gradient(r)
    dth = np.gradient(th)

    nt, nr = len(th), len(r)
    # data layout: r fastest within each theta row (reference: mclib_riken.c:204-210)
    R = np.tile(r, nt)
    TH = np.repeat(th, nr)
    DR = np.tile(dr, nt)
    DTH = np.repeat(dth, nr)

    arr = dict(
        r0=R * cfg.hydro_l_scale,
        r1=TH,
        dr0=DR * cfg.hydro_l_scale,
        dr1=DTH,
        v0=vel_r,
        v1=vel_t,
        dens=dens * cfg.hydro_d_scale,
        pres=pres * cfg.hydro_p_scale,
    )
    keep = decimation_mask(
        cfg,
        arr["r0"], arr["r1"], 0.0, arr["dr0"], arr["dr1"], 0.0,
        fps, r_inj, ph_inj_switch, min_r, max_r, min_theta, max_theta,
        cyclosynchrotron=cfg.cyclosynchrotron,
    )
    arr = {k: v[keep] for k, v in arr.items()}
    return frame_from_numpy(cfg, arr)


def riken_frame_schedule(frame: int, base_fps: float):
    """(frame increment, fps) for RIKEN 3-D runs: beyond frame 3000 files come
    every 10 frames at 1 fps (reference: Src/mcrat.c:551-562, 612-624)."""
    if frame >= 3000:
        return 10, 1.0
    return 1, base_fps
