"""End-to-end driver test: full inject -> transport -> checkpoint -> dump ->
merge pipeline on the analytic spherical outflow, plus restart."""
import glob
import os

import numpy as np
import pytest

from mcrat_tpu.config import Config, Dims, Geometry, McPar, SimType, Spectrum
from mcrat_tpu.driver import (
    decompose_work, default_synthetic_factory, merge_rank_outputs, run_rank,
)
from mcrat_tpu.io.hydro import HydroPaths
from mcrat_tpu.io.photons_h5 import read_frame


def _par(restart="i"):
    return McPar(
        fps=5.0,
        last_frame=13,
        r0_domain=(1e12, 5e13),
        r1_domain=(0.0, 1.0),
        r2_domain=(0.0, 0.0),
        theta_min_deg=0.0,
        theta_max_deg=6.0,
        n_theta_bins=2,
        frm0=(10, 10),
        frm2=(11, 11),
        inj_radius=(8e12, 8e12),
        spect=Spectrum.BLACKBODY,
        min_photons=300,
        max_photons=1500,
        restart=restart,
    )


CFG = Config(
    dims=Dims.TWO,
    geometry=Geometry.SPHERICAL,
    simulation_type=SimType.SPHERICAL_OUTFLOW,
    dtype="float64",
)


def test_decompose_work(tmp_path):
    par = _par()
    # 4 ranks over 2 angle bins: 2 ranks per bin, each taking one inj frame
    w0 = decompose_work(par, 0, 4, str(tmp_path))
    w1 = decompose_work(par, 1, 4, str(tmp_path))
    w2 = decompose_work(par, 2, 4, str(tmp_path))
    assert w0.angle_id == 0 and w2.angle_id == 1
    assert w0.framestart == 10 and w0.frm2 == 10
    assert w1.framestart == 11 and w1.frm2 == 11
    assert w0.mc_dir != w2.mc_dir
    assert abs(np.degrees(w0.theta_max) - 3.0) < 1e-12


def test_run_rank_end_to_end(tmp_path):
    par = _par()
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    work = run_rank(
        CFG, par, paths, rank=0, num_ranks=2, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    # rank 0 of 2 is the only rank in angle bin 0 -> covers both injection frames
    assert work.framestart == 10 and work.frm2 == 11
    # outputs exist: checkpoint + per-proc file
    assert os.path.exists(os.path.join(work.mc_dir, "mc_chkpt_0.npz"))
    proc = os.path.join(work.mc_dir, "mc_proc_0.h5")
    assert os.path.exists(proc)

    import h5py

    with h5py.File(proc) as f:
        frames = sorted(int(k) for k in f.keys())
    # photons dumped for every scattering frame 10..13
    assert frames == [10, 11, 12, 13]

    counts = merge_rank_outputs(work, par)
    merged = [f for f in counts.values() if f > 0]
    assert len(merged) == 4
    data = read_frame(os.path.join(work.mc_dir, "mcdata_13.h5"))
    assert (data["PW"] > 0).all()
    assert len(data["P0"]) >= 300
    # energies are positive and photons moved outward over 4 frames
    assert (data["P0"] > 0).all()
    r = np.sqrt(data["R0"] ** 2 + data["R1"] ** 2 + data["R2"] ** 2)
    assert r.mean() > 8e12


def test_run_rank_restart_continue(tmp_path):
    """Simulate a mid-run kill: craft the checkpoint an interrupted rank leaves
    (restart='c', scattering loop part-way through) and continue from it."""
    import jax.numpy as jnp

    from mcrat_tpu import transport
    from mcrat_tpu.io.checkpoint import CheckpointState, save_checkpoint

    par = _par(restart="c")
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    work = decompose_work(par, 0, 4, str(tmp_path) + "/MC/")
    os.makedirs(work.mc_dir, exist_ok=True)

    # inject a population "as of frame 10", pretend frames 10-11 already ran
    host, _ = factory(10)
    rng = np.random.default_rng(1)
    arrays, w = transport.inject_photons(
        host, work.r_inj, 1e50, par.min_photons, par.max_photons,
        par.spect, work.theta_min, work.theta_max, par.fps, rng,
    )
    ph, meta = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    save_checkpoint(
        work.mc_dir, 0,
        CheckpointState(
            frame=10, frm2=work.frm2, scatt_frame=12, time_now=12 / par.fps,
            restart="c", weight_norm=meta.weight_norm, n_injected=meta.n_injected,
        ),
        ph,
    )

    work2 = run_rank(
        CFG, par, paths, rank=0, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    proc = os.path.join(work2.mc_dir, "mc_proc_0.h5")
    import h5py

    with h5py.File(proc) as f:
        frames = sorted(int(k) for k in f.keys())
    # resumed at scatt frame 12: only 12 and 13 get dumped in this run
    assert frames == [12, 13]


def test_cross_angle_all_data_merge(tmp_path):
    """The standalone-MERGE equivalent: per-process files from EVERY angle
    directory combine into ALL_DATA/mcdata_<frame>.h5 (Src/merge.c:23-336)."""
    import h5py

    from mcrat_tpu.io.photons_h5 import merge_across_angles, read_frame

    par = _par()
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    # 2 ranks over 2 angle bins -> one rank per bin, different angle dirs
    w0 = run_rank(CFG, par, paths, rank=0, num_ranks=2, chunk_rounds=0,
                  synthetic_frame_factory=factory, progress=False)
    w1 = run_rank(CFG, par, paths, rank=1, num_ranks=2, chunk_rounds=0,
                  synthetic_frame_factory=factory, progress=False)
    assert w0.mc_dir != w1.mc_dir
    base = os.path.dirname(w0.mc_dir)

    counts = merge_across_angles(base)
    assert sorted(counts) == [10, 11, 12, 13]
    # totals equal the sum of the two angle dirs' per-frame counts
    for fr, total in counts.items():
        per_dir = 0
        for adir in (w0.mc_dir, w1.mc_dir):
            with h5py.File(os.path.join(adir, f"mc_proc_{0 if adir == w0.mc_dir else 1}.h5")) as f:
                if str(fr) in f:
                    per_dir += f[str(fr)]["P0"].shape[0]
        assert total == per_dir and total > 0
        data = read_frame(os.path.join(base, "ALL_DATA", f"mcdata_{fr}.h5"))
        assert len(data["P0"]) == total
    # idempotent (the reference's corruption-check resume)
    again = merge_across_angles(base)
    assert again == counts

    # the CLI auto-detects a base dir and routes to the cross-angle merge
    from mcrat_tpu.cli import main as cli_main

    rc = cli_main(["merge", base])
    assert rc == 0


def test_elastic_readoption(tmp_path):
    """A dead 2-rank job is finished by a 1-rank job: cli run --elastic adopts
    exactly the unfinished old ranks (reference: Src/mcrat.c:166-448, which
    instead aborts unless the new rank count maps exactly)."""
    import h5py
    import jax.numpy as jnp

    from mcrat_tpu import transport
    from mcrat_tpu.driver import elastic_work_items, run_elastic
    from mcrat_tpu.io.checkpoint import CheckpointState, save_checkpoint

    par = _par()
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    # old job: rank 0 (angle bin 0) ran to completion...
    w0 = run_rank(CFG, par, paths, rank=0, num_ranks=2, chunk_rounds=0,
                  synthetic_frame_factory=factory, progress=False)
    base = os.path.dirname(w0.mc_dir)
    # ...rank 1 (angle bin 1) died mid-run: craft its interrupted checkpoint
    w1 = decompose_work(par, 1, 2, base)
    os.makedirs(w1.mc_dir, exist_ok=True)
    host, _ = factory(10)
    rng = np.random.default_rng(7)
    arrays, _ = transport.inject_photons(
        host, w1.r_inj, 1e50, par.min_photons, par.max_photons,
        par.spect, w1.theta_min, w1.theta_max, par.fps, rng,
    )
    ph, meta = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float64)
    save_checkpoint(
        w1.mc_dir, 1,
        CheckpointState(frame=10, frm2=w1.frm2, scatt_frame=12,
                        time_now=12 / par.fps, restart="c",
                        weight_norm=meta.weight_norm, n_injected=meta.n_injected),
        ph,
    )

    items = elastic_work_items(par, base, par.last_frame)
    # only the dead rank is unfinished (rank 0 left an injection-complete marker)
    assert [wi.old_rank for _, _, wi in items] == [1]

    done = run_elastic(
        CFG, par, paths, rank=0, num_ranks=1, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    assert len(done) == 1 and done[0].mc_dir == w1.mc_dir
    proc = os.path.join(w1.mc_dir, "mc_proc_1.h5")
    with h5py.File(proc) as f:
        frames = sorted(int(k) for k in f.keys())
    # resumed at scatt frame 12 of inj frame 10, then ran inj frame 11 fully
    assert frames == [11, 12, 13]
    # nothing left to adopt afterwards
    assert elastic_work_items(par, base, par.last_frame) == []


def test_initialize_mode_cleans_stale_output(tmp_path):
    """Re-running an initialize job in a dirty directory must NOT double-count
    photons: the reference deletes mc_proc_*/mcdata_*/mc_chkpt_* before a fresh
    run (Src/mcrat.c:507-549); append-mode HDF5 writes would otherwise append a
    second copy of every frame group."""
    import h5py

    par = _par(restart="i")
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    # rank 1 is NOT its angle dir's designated cleaner (rank 0 is), so the
    # re-run exercises the marker-wait fallback: after wait_s with no cleaner
    # marker it removes its own files + shared merged outputs
    work = run_rank(
        CFG, par, paths, rank=1, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    proc = os.path.join(work.mc_dir, "mc_proc_1.h5")
    with h5py.File(proc) as f:
        n_first = {k: f[k]["P0"].shape[0] for k in f.keys()}
    # stale merged output that the fresh run must remove
    stale = os.path.join(work.mc_dir, "mcdata_99.h5")
    with h5py.File(stale, "w") as f:
        f.create_dataset("P0", data=np.zeros(3))

    run_rank(
        CFG, par, paths, rank=1, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
        init_clean_wait_s=0.5,
    )
    with h5py.File(proc) as f:
        n_second = {k: f[k]["P0"].shape[0] for k in f.keys()}
    # photon counts are statistically similar but NOT appended (the second run
    # would roughly double every group if the cleanup were missing)
    for k in n_first:
        assert n_second[k] < 1.5 * n_first[k], (k, n_first[k], n_second[k])
    assert not os.path.exists(stale)


def test_reinitialize_with_fewer_ranks_sweeps_all(tmp_path):
    """A re-initialize with FEWER ranks than the previous job must delete the
    other old ranks' mc_proc_*.h5 (reference sweeps the whole directory,
    Src/mcrat.c:507-549) — otherwise merge_all silently double-counts the
    stale ranks' photons."""
    import h5py

    par = _par(restart="i")
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(CFG, par, nr=128, ntheta=24)
    # first job: two ranks share angle bin 0 (frames 10 and 11)
    work0 = run_rank(
        CFG, par, paths, rank=0, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    run_rank(
        CFG, par, paths, rank=1, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    assert os.path.exists(os.path.join(work0.mc_dir, "mc_proc_0.h5"))
    assert os.path.exists(os.path.join(work0.mc_dir, "mc_proc_1.h5"))

    # second job: ONE rank per angle covers both frames; rank 0 is the
    # cleaner and must sweep rank 1's stale output before writing
    work = run_rank(
        CFG, par, paths, rank=0, num_ranks=2, chunk_rounds=0,
        synthetic_frame_factory=factory, progress=False,
    )
    assert not os.path.exists(os.path.join(work.mc_dir, "mc_proc_1.h5"))
    merge_rank_outputs(work, par, last_frame=par.last_frame)
    # merged frame must contain ONLY the second job's photons
    with h5py.File(os.path.join(work.mc_dir, "mc_proc_0.h5")) as f:
        n_proc = {k: f[k]["P0"].shape[0] for k in f.keys()}
    for frame, n in n_proc.items():
        data = read_frame(os.path.join(work.mc_dir, f"mcdata_{frame}.h5"))
        assert data["P0"].shape[0] == n, (frame, data["P0"].shape[0], n)


def test_scan_checkpoints_discovers_old_backup(tmp_path):
    """A crash between save_checkpoint's two renames leaves only the .old
    backup; elastic restart discovery must still find the rank (advisor
    round-3 finding)."""
    from mcrat_tpu.io.checkpoint import (
        CheckpointState, checkpoint_path, save_checkpoint, scan_checkpoints,
    )

    st = CheckpointState(frame=10, frm2=11, scatt_frame=11, time_now=2.2,
                         restart="c")
    save_checkpoint(str(tmp_path), 3, st)
    # simulate the crash window: primary renamed to .old, new file never landed
    os.replace(checkpoint_path(str(tmp_path), 3),
               checkpoint_path(str(tmp_path), 3) + ".old")
    items = scan_checkpoints(str(tmp_path), last_frame=13)
    assert [wi.old_rank for wi in items] == [3]
    assert items[0].state.scatt_frame == 11


def test_run_rank_with_cyclosynchrotron(tmp_path):
    """Full driver pass with the cyclo-synchrotron module on: pool photons are
    emitted into the advected shell, scatter in place (promoted to
    COMPTONIZED), get replenished, and below-nu_c photons are absorbed."""
    from mcrat_tpu.config import BFieldCalc

    cfg = Config(
        dims=Dims.TWO,
        geometry=Geometry.SPHERICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW,
        cyclosynchrotron=True,
        b_field_calc=BFieldCalc.TOTAL_E,
        epsilon_b=0.5,
        dtype="float64",
    )
    par = _par()
    paths = HydroPaths(filepath=str(tmp_path) + "/", mc_path="MC/")
    factory = default_synthetic_factory(cfg, par, nr=128, ntheta=24)
    work = run_rank(
        cfg, par, paths, rank=0, num_ranks=4, chunk_rounds=0,
        synthetic_frame_factory=factory, last_frame_override=12, progress=False,
    )
    proc = os.path.join(work.mc_dir, "mc_proc_0.h5")
    assert os.path.exists(proc)
    import h5py

    with h5py.File(proc) as f:
        frames = sorted(int(k) for k in f.keys())
        data = {k: np.asarray(f[str(frames[-1])][k]) for k in f[str(frames[-1])]}
    assert frames[-1] == 12
    # photon types present include injected survivors; pool photons are
    # excluded from dumps
    types = set(data["PT"].tolist())
    assert b"p" not in types
    assert (data["PW"] > 0).all()
