"""I/O layer tests: mc.par, FLASH/PLUTO/Chombo readers, photon dumps, checkpoints."""
import os

import numpy as np
import pytest

from mcrat_tpu.config import (
    Config, Dims, Geometry, HydroSim, McPar, PhotonType, SimType, Spectrum,
)
from mcrat_tpu.constants import ME_C
from mcrat_tpu.io import checkpoint as ckpt
from mcrat_tpu.io import mcpar, photons_h5
from mcrat_tpu.io.flash import read_flash
from mcrat_tpu.io.pluto import read_pluto
from mcrat_tpu.io.pluto_chombo import read_pluto_chombo


MCPAR_TEXT = """[Hydro/MHD Simulation Block]

10.               # Number of frames per second of hydro simulation
900\t\t# Last available hydro simulation frame
0 4e12\t\t# Max r0 coordinate limits
0 1.5\t\t# Max r1 coordinate limit
0 0\t\t# Max r2 coordinate limit
[MCRaT Injection Angles Block]

1.               \t# min angle
7.               \t# max angle
2\t\t\t# Number of angle bins
100 150      \t# Injection start frames
3 4            \t# Number of injection frames
1e12 2e12\t# Injection radii

[MCRaT Photon Block]

w\t\t# spectrum type
500\t\t# Min photons
2500\t\t# Max photons

[Initialization/Continuation Block]

c\t\t# initialize or continue
"""


def test_mcpar_parse_and_roundtrip(tmp_path):
    p = tmp_path / "mc.par"
    p.write_text(MCPAR_TEXT)
    par = mcpar.read_mcpar(str(p))
    assert par.fps == 10.0
    assert par.last_frame == 900
    assert par.n_theta_bins == 2
    assert par.frm0 == (100, 150)
    assert par.frm2 == (103, 154)  # frm0 + n_inject (reference: mcrat_io.c:1198)
    assert par.inj_radius == (1e12, 2e12)
    assert par.spect is Spectrum.WIEN
    assert par.min_photons == 500 and par.max_photons == 2500
    assert par.restart == "c"
    # write + reparse is stable
    p2 = tmp_path / "mc2.par"
    mcpar.write_mcpar(par, str(p2))
    par2 = mcpar.read_mcpar(str(p2))
    assert par2 == par


@pytest.fixture
def flash_file(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    nblk = 12
    path = tmp_path / "flash_hdf5_chk_0010"
    coords = np.stack(
        [rng.uniform(5, 50, nblk), rng.uniform(5, 50, nblk)], axis=-1
    )
    bsz = np.full((nblk, 2), 8.0)
    node = np.ones((nblk, 1), np.int32)
    node[0] = 2  # one non-leaf block
    with h5py.File(path, "w") as f:
        f["coordinates"] = coords
        f["block size"] = bsz
        f["node type"] = node
        for name in ("velx", "vely"):
            f[name] = rng.uniform(-0.1, 0.1, (nblk, 64))
        f["dens"] = rng.uniform(1e-8, 1e-6, (nblk, 64))
        f["pres"] = rng.uniform(1e5, 1e7, (nblk, 64))
    return str(path), coords, node


def test_flash_reader(flash_file):
    path, coords, node = flash_file
    cfg = Config(
        sim_switch=HydroSim.FLASH,
        dims=Dims.TWO,
        geometry=Geometry.CARTESIAN,
        hydro_l_scale=1e9,
        hydro_d_scale=1.0,
        dtype="float64",
    )
    host = read_flash(cfg, path, fps=5.0, r_inj=1.0, ph_inj_switch=True)
    nleaf = int((node == 1).sum())
    assert host.num_elements == nleaf * 64  # 8x8 expansion of leaf blocks
    # cell sizes are block/8 * L scale
    np.testing.assert_allclose(host.dr0, 1e9)
    # derived gamma from velocities
    assert (host.gamma >= 1.0).all()
    assert (host.temp > 0).all()
    # decimation in injection mode keeps cells with r > 0.95 r_inj = tiny
    assert host.num_elements > 0


@pytest.fixture
def pluto_dir(tmp_path):
    n1, n2 = 32, 16
    r_edges = np.geomspace(1e10, 1e12, n1 + 1)
    t_edges = np.linspace(0, 1.2, n2 + 1)
    with open(tmp_path / "grid.out", "w") as f:
        f.write("# PLUTO grid file\n# more header\n")
        f.write(f"{n1}\n")
        for i in range(n1):
            f.write(f"{i+1} {r_edges[i]:.10e} {r_edges[i+1]:.10e}\n")
        f.write(f"{n2}\n")
        for i in range(n2):
            f.write(f"{i+1} {t_edges[i]:.10e} {t_edges[i+1]:.10e}\n")
        f.write("1\n1 0.0 1.0\n")
    with open(tmp_path / "dbl.out", "w") as f:
        f.write("0 0.0 1e-3 0 single_file little rho vx1 vx2 prs\n")
    rng = np.random.default_rng(2)
    rho = rng.uniform(1e-10, 1e-8, (n2, n1))
    vx1 = rng.uniform(0, 0.9, (n2, n1))
    vx2 = rng.uniform(-0.05, 0.05, (n2, n1))
    prs = rng.uniform(1e-4, 1e-2, (n2, n1))
    data = np.concatenate([a.ravel() for a in (rho, vx1, vx2, prs)])
    data.tofile(tmp_path / "data.0031.dbl")
    return tmp_path, (r_edges, t_edges), (rho, vx1, vx2, prs)


def test_pluto_reader(pluto_dir):
    tmp_path, (r_edges, t_edges), (rho, vx1, vx2, prs) = pluto_dir
    cfg = Config(
        sim_switch=HydroSim.PLUTO,
        dims=Dims.TWO,
        geometry=Geometry.SPHERICAL,
        hydro_l_scale=1.0,
        hydro_d_scale=1.0,
        dtype="float64",
    )
    host = read_pluto(
        cfg, str(tmp_path / "data.0031.dbl"), fps=5.0, r_inj=1e10, ph_inj_switch=True
    )
    # injection mode keeps r > 0.95e10 -> nearly everything
    n1, n2 = len(r_edges) - 1, len(t_edges) - 1
    assert host.num_elements > 0.9 * n1 * n2
    # check a specific cell's values: x1 fastest layout
    rc = 0.5 * (r_edges[:-1] + r_edges[1:])
    i_cell = np.argmin(np.abs(host.r0 - rc[5]) + np.abs(host.r1 - 0.5 * (t_edges[3] + t_edges[4])))
    np.testing.assert_allclose(host.dens[i_cell], rho[3, 5], rtol=1e-12)
    np.testing.assert_allclose(host.v0[i_cell], vx1[3, 5], rtol=1e-12)
    # theta axis NOT scaled by L for spherical geometry
    assert host.r1.max() < 2.0


@pytest.fixture
def chombo_file(tmp_path):
    import h5py

    path = tmp_path / "data.0005.hdf5"
    # level 0: 8x8 domain, one box covering all; level 1: refined 8x8 box over
    # the lower-left quadrant (indices 0..7 at ratio 2 -> coarse 0..3)
    box_dt = np.dtype(
        [("lo_i", "<i4"), ("lo_j", "<i4"), ("hi_i", "<i4"), ("hi_j", "<i4")]
    )
    with h5py.File(path, "w") as f:
        g = f.create_group("Chombo_global")
        g.attrs["SpaceDim"] = np.int32(2)
        f.attrs["num_levels"] = np.int32(2)
        f.attrs["num_components"] = np.int32(4)
        for i, name in enumerate(["rho", "vx1", "vx2", "prs"]):
            f.attrs[f"component_{i}"] = np.bytes_(name)
        rng = np.random.default_rng(3)

        def level(name, boxes, dx, shape_cells, ref):
            g = f.create_group(name)
            g.attrs["prob_domain"] = np.array(
                (0, 0, shape_cells - 1, shape_cells - 1), dtype=box_dt
            )
            g.attrs["dx"] = np.float64(dx)
            g.attrs["logr"] = np.int32(0)
            g.attrs["domBeg1"] = np.float64(0.0)
            g.attrs["domBeg2"] = np.float64(0.0)
            g.attrs["g_x2stretch"] = np.float64(1.0)
            g.attrs["ref_ratio"] = np.int32(ref)
            b = np.array(boxes, dtype=box_dt)
            g["boxes"] = b
            ncell = sum(
                (x["hi_i"] - x["lo_i"] + 1) * (x["hi_j"] - x["lo_j"] + 1) for x in b
            )
            data = rng.uniform(0.5, 1.5, ncell * 4)
            g["data:datatype=0"] = data
            offs = [0]
            for x in b:
                offs.append(
                    offs[-1]
                    + 4 * (x["hi_i"] - x["lo_i"] + 1) * (x["hi_j"] - x["lo_j"] + 1)
                )
            g["data:offsets=0"] = np.asarray(offs[:-1], np.int64)

        level("level_0", [(0, 0, 7, 7)], 1.0, 8, 2)
        level("level_1", [(0, 0, 7, 7)], 0.5, 16, 2)
    return str(path)


def test_chombo_reader_amr_flatten(chombo_file):
    cfg = Config(
        sim_switch=HydroSim.PLUTO_CHOMBO,
        dims=Dims.TWO,
        geometry=Geometry.SPHERICAL,
        hydro_l_scale=1.0,
        hydro_d_scale=1.0,
        dtype="float64",
    )
    host = read_pluto_chombo(cfg, chombo_file, fps=5.0, r_inj=0.1, ph_inj_switch=True)
    # level 0 has 64 cells, 16 covered by the level-1 box (coarse 0..3 square);
    # level 1 adds 64 fine cells -> 48 + 64 = 112 before decimation
    assert host.num_elements == 112
    # fine cells have half the coarse size
    sizes = np.unique(np.round(host.dr0, 12))
    assert set(sizes) == {0.5, 1.0}


def test_photon_dump_and_merge(tmp_path):
    import jax.numpy as jnp

    from mcrat_tpu import transport

    cfg = Config(dtype="float64")
    n = 100
    rng = np.random.default_rng(4)
    arrays = dict(
        p=np.abs(rng.normal(size=(n, 4))) + 1.0,
        comv_p=np.abs(rng.normal(size=(n, 4))) + 1.0,
        pos=rng.normal(size=(n, 3)) * 1e12,
        s=np.tile([1.0, 0.1, 0.0, 0.0], (n, 1)),
        weight=np.full(n, 2.5e40),
        num_scatt=rng.integers(0, 50, n).astype(float),
        cell=np.arange(n, dtype=np.int32),
        ptype=np.full(n, int(PhotonType.INJECTED), np.int32),
    )
    ph, meta = transport.photons_from_arrays(arrays, capacity=128, dtype=jnp.float64)
    f0 = str(tmp_path / "mc_proc_0.h5")
    n_written = photons_h5.append_photons(cfg, f0, 30, ph, meta)
    assert n_written == n
    # second batch appends into the same frame group
    photons_h5.append_photons(cfg, f0, 30, ph, meta)
    # second rank file
    photons_h5.append_photons(cfg, str(tmp_path / "mc_proc_1.h5"), 30, ph, meta)

    total = photons_h5.merge_frame(str(tmp_path), 30)
    assert total == 3 * n
    data = photons_h5.read_frame(str(tmp_path / "mcdata_30.h5"))
    for k in ("P0", "P1", "R0", "S1", "NS", "PW", "PT", "COMV_P0"):
        assert k in data and len(data[k]) == 3 * n
    # units: P0 on disk is E/c in cgs = p0_hat * m_e c; weights are physical
    np.testing.assert_allclose(data["P0"][:n], arrays["p"][:, 0] * ME_C, rtol=1e-12)
    np.testing.assert_allclose(data["PW"][:n], arrays["weight"], rtol=1e-12)
    assert data["PT"][0] == b"i"
    # merge is idempotent
    assert photons_h5.merge_frame(str(tmp_path), 30) == 3 * n


def test_checkpoint_roundtrip_and_scan(tmp_path):
    import jax.numpy as jnp

    from mcrat_tpu import transport

    n = 64
    rng = np.random.default_rng(5)
    arrays = dict(
        p=np.abs(rng.normal(size=(n, 4))),
        comv_p=np.abs(rng.normal(size=(n, 4))),
        pos=rng.normal(size=(n, 3)),
        s=np.tile([1.0, 0, 0, 0], (n, 1)),
        weight=np.full(n, 1.0),
        num_scatt=np.zeros(n),
        cell=np.zeros(n, np.int32),
        ptype=np.full(n, int(PhotonType.COMPTONIZED), np.int32),
    )
    ph, meta = transport.photons_from_arrays(arrays, capacity=n, dtype=jnp.float64)
    st = ckpt.CheckpointState(
        frame=200, frm2=205, scatt_frame=220, time_now=44.0, restart="c",
        weight_norm=meta.weight_norm, n_injected=n,
    )
    ckpt.save_checkpoint(str(tmp_path), 3, st, ph)
    # second save keeps an _old backup
    ckpt.save_checkpoint(str(tmp_path), 3, st, ph)
    assert os.path.exists(tmp_path / "mc_chkpt_3.npz.old")

    st2, ph2 = ckpt.load_checkpoint(str(tmp_path), 3)
    assert st2 == st
    np.testing.assert_allclose(np.asarray(ph2.p), np.asarray(ph.p))
    # COMPTONIZED photons relabel to UNABSORBED_CS on save (mcrat_io.c:896-901)
    assert (np.asarray(ph2.ptype) == int(PhotonType.UNABSORBED_CS)).all()

    # planes dropped from the persistence fetch (COMV/Stokes off — the
    # reference's defaults, Src/mcrat.h:391-402) restore as recomputable
    # zeros / the unpolarized init instead of crashing the resume
    ph_slim = ph.replace(
        comv_p=jnp.zeros((0, 4), ph.p.dtype), s=jnp.zeros((0, 4), ph.p.dtype)
    )
    ckpt.save_checkpoint(str(tmp_path), 5, st, ph_slim)
    st3, ph3 = ckpt.load_checkpoint(str(tmp_path), 5)
    assert st3 == st
    assert ph3.comv_p.shape == (n, 4) and not np.asarray(ph3.comv_p).any()
    np.testing.assert_allclose(np.asarray(ph3.s[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(ph3.p), np.asarray(ph.p))

    # a finished rank
    done = ckpt.CheckpointState(
        frame=206, frm2=205, scatt_frame=901, time_now=90.0, restart="c",
    )
    ckpt.save_checkpoint(str(tmp_path), 7, done, None)
    items = ckpt.scan_checkpoints(str(tmp_path), last_frame=900)
    ranks = [w.old_rank for w in items]
    assert 3 in ranks and 7 not in ranks


# ---------------------------------------------------------------------------
# RIKEN 3-D reader


def _write_riken_var(path, idx_1based, data_f32):
    """Fortran-unformatted layout of mclib_riken.c:464-476: record marker,
    six int32 slice indexes (1-based), two floats, float32 data."""
    with open(path, "wb") as f:
        np.float32(0.0).tofile(f)
        np.asarray(idx_1based, dtype=np.int32).tofile(f)
        np.zeros(2, dtype=np.float32).tofile(f)
        np.asarray(data_f32, dtype=np.float32).tofile(f)


def test_riken_3d_reader(tmp_path):
    from mcrat_tpu.io import riken

    prefix = str(tmp_path) + "/"
    nr, nt, nphi = 6, 3, 2
    r_lo, t_lo, p_lo = 1, 0, 0  # 0-based slice starts
    frame = 1500  # -> radial remapping segment 1 (mclib_riken.c:676-682)
    assert riken.riken_radial_segment(frame) == 1

    # radial grid file holds the full segment; only [r_lo, r_lo+nr) is read
    r_all = 1e10 * (1.0 + 0.05 * np.arange(10))
    np.savetxt(tmp_path / "grid01-x1.data", r_all[None], delimiter=", ")
    th_all = np.linspace(0.3, 0.5, nt)
    np.savetxt(tmp_path / "grid-x2.data", th_all[None], delimiter=", ")
    phi_all = np.array([0.25, 1.75])
    np.savetxt(tmp_path / "grid-x3.data", phi_all[None], delimiter=", ")

    idx = [p_lo + 1, p_lo + nphi, t_lo + 1, t_lo + nt, r_lo + 1, r_lo + nr]
    n = nphi * nt * nr
    rng = np.random.default_rng(7)
    dens = rng.uniform(1e-9, 1e-7, n)
    v_r = rng.uniform(0.1, 0.9, n)
    v_t = rng.uniform(-0.05, 0.05, n)
    v_p = rng.uniform(-0.05, 0.05, n)
    pres = rng.uniform(1e2, 1e4, n)  # file units: p / c^2
    for var, data in ((1, dens), (2, v_r), (3, v_t), (4, v_p), (8, pres)):
        _write_riken_var(
            tmp_path / f"u0{var}-{frame:05d}small.data", idx, data
        )

    cfg = Config(
        sim_switch=HydroSim.RIKEN, dims=Dims.THREE, geometry=Geometry.SPHERICAL,
        dtype="float64",
    )
    host = riken.read_riken_3d(
        cfg, prefix, frame, fps=5.0, r_inj=float(r_all[3]), ph_inj_switch=True
    )
    # c/fps = 6e9 covers the whole 1e10-wide grid: nothing decimated
    assert host.num_elements == n

    f32 = lambda a: np.asarray(a, dtype=np.float32).astype(np.float64)
    # layout: phi slowest, theta, r fastest (mclib_riken.c:880)
    k = 2 + nt * nr  # r index 2, theta 0, phi 1
    assert host.r0[k] == pytest.approx(r_all[r_lo + 2])
    assert host.r1[k] == pytest.approx(th_all[0])
    assert host.r2[k] == pytest.approx(phi_all[1])
    np.testing.assert_allclose(host.dens, f32(dens))
    np.testing.assert_allclose(host.pres, f32(pres) * cfg.hydro_p_scale, rtol=1e-12)
    # derived: gamma from all three velocity components (mclib_riken.c:888)
    g = 1.0 / np.sqrt(1.0 - (f32(v_r) ** 2 + f32(v_t) ** 2 + f32(v_p) ** 2))
    np.testing.assert_allclose(host.gamma, g, rtol=1e-12)
    np.testing.assert_allclose(host.dens_lab, f32(dens) * g, rtol=1e-12)
    # radial widths come from the remapped analytic recurrence
    dr = riken.riken_radial_widths()
    assert host.dr0[k] == pytest.approx(dr[riken.REMAP_STRIDE_3D + r_lo + 2])
    assert host.dr1[k] == pytest.approx(np.pi / 560)
    # jet axis is +y: spherical cache holds theta' = acos(sin th sin phi)
    expect = np.arccos(np.sin(th_all[0]) * np.sin(phi_all[1]))
    assert host.theta[k] == pytest.approx(expect)


def test_riken_frame_schedule():
    from mcrat_tpu.io.riken import riken_frame_schedule

    assert riken_frame_schedule(100, 10.0) == (1, 10.0)
    assert riken_frame_schedule(3000, 10.0) == (10, 1.0)


def test_riken_2d_reader(tmp_path):
    from mcrat_tpu.io import riken

    prefix = str(tmp_path) + "/"
    nr, nt = 5, 3
    r_lo, t_lo = 2, 1  # 0-based slice starts
    frame = 37

    r_all = 1e10 * (1.0 + 0.1 * np.arange(12))
    np.savetxt(tmp_path / "grid-x1.data", r_all[None], delimiter=", ")
    th_all = np.linspace(0.1, 0.6, 8)
    np.savetxt(tmp_path / "grid-x2.data", th_all[None], delimiter=", ")

    # header order: phi_min, phi_max, theta_min, theta_max, r_min, r_max
    idx = [1, 1, t_lo + 1, t_lo + nt, r_lo + 1, r_lo + nr]
    n = nt * nr
    rng = np.random.default_rng(11)
    dens = rng.uniform(1e-9, 1e-7, n)
    v_r = rng.uniform(0.1, 0.8, n)
    v_t = rng.uniform(-0.05, 0.05, n)
    pres = rng.uniform(1e2, 1e4, n)
    for var, data in ((1, dens), (2, v_r), (3, v_t), (8, pres)):
        _write_riken_var(tmp_path / f"u0{var}-{frame:04d}small.data", idx, data)

    cfg = Config(
        sim_switch=HydroSim.RIKEN, dims=Dims.TWO, geometry=Geometry.SPHERICAL,
        dtype="float64",
    )
    # injection-mode decimation keeps cells with r > 0.95 r_inj
    # (decimate.decimation_mask; reference: mclib_flash.c:318-322)
    r_inj = float(r_all[r_lo])
    host = riken.read_riken_2d(
        cfg, prefix, frame, fps=1.0, r_inj=r_inj, ph_inj_switch=True,
    )
    assert host.num_elements == n  # the whole slice sits above 0.95 r_inj

    f32 = lambda a: np.asarray(a, dtype=np.float32).astype(np.float64)
    # layout: r fastest within each theta row (mclib_riken.c:204-210)
    k = 3 + 1 * nr  # r index 3, theta index 1
    assert host.r0[k] == pytest.approx(r_all[r_lo + 3])
    assert host.r1[k] == pytest.approx(th_all[t_lo + 1])
    np.testing.assert_allclose(host.dens, f32(dens))
    g = 1.0 / np.sqrt(1.0 - (f32(v_r) ** 2 + f32(v_t) ** 2))
    np.testing.assert_allclose(host.gamma, g, rtol=1e-12)

    # deeper injection radius decimates the low-r rows away
    host2 = riken.read_riken_2d(
        cfg, prefix, frame, fps=1.0, r_inj=float(r_all[r_lo + 2]),
        ph_inj_switch=True,
    )
    expect = int((r_all[r_lo : r_lo + nr] > 0.95 * r_all[r_lo + 2]).sum()) * nt
    assert host2.num_elements == expect
