"""Observable reductions (spectra, polarization, light curves) on synthetic
photon dumps with closed-form expectations."""
import numpy as np
import pytest

from mcrat_tpu import analysis
from mcrat_tpu.constants import C_LIGHT, ERG_TO_KEV


def _dump(e_kev, theta, w, q=None, u=None, ns=None):
    """Build a merged-frame dict for photons flying at polar angle theta."""
    e_kev = np.asarray(e_kev, dtype=float)
    theta = np.asarray(theta, dtype=float)
    p0 = e_kev / ERG_TO_KEV / C_LIGHT
    n = len(e_kev)
    return {
        "P0": p0,
        "P1": p0 * np.sin(theta),
        "P2": np.zeros(n),
        "P3": p0 * np.cos(theta),
        "PW": np.asarray(w, dtype=float),
        "S1": np.zeros(n) if q is None else np.asarray(q, dtype=float),
        "S2": np.zeros(n) if u is None else np.asarray(u, dtype=float),
        "NS": np.zeros(n) if ns is None else np.asarray(ns, dtype=float),
    }


def test_detector_mask_and_spectrum_normalization():
    # 3 photons in the band at 100 keV, 1 outside the band, 1 zero-weight
    data = _dump(
        e_kev=[100, 100, 100, 100, 100],
        theta=[0.1, 0.12, 0.14, 0.5, 0.1],
        w=[2.0, 3.0, 5.0, 7.0, 0.0],
    )
    bins = np.geomspace(10, 1000, 21)
    c, dnde, err = analysis.spectrum(data, 0.0, 0.2, e_bins_kev=bins)
    # integral of dN/dE dE recovers the total in-band weight
    assert np.sum(dnde * np.diff(bins)) == pytest.approx(10.0)
    # all weight lands in one bin, and that bin contains 100 keV
    assert np.count_nonzero(dnde) == 1
    k = int(np.flatnonzero(dnde)[0])
    assert bins[k] <= 100.0 * (1 + 1e-12) and 100.0 <= bins[k + 1] * (1 + 1e-12)
    assert (err >= 0).all()


def test_peak_energy_tracks_the_hot_component():
    rng = np.random.default_rng(0)
    # 2000 photons at ~50 keV plus 2000 carrying 10x the weight at ~300 keV
    e = np.concatenate([
        rng.normal(50, 2, 2000).clip(1), rng.normal(300, 10, 2000).clip(1)
    ])
    w = np.concatenate([np.ones(2000), 10 * np.ones(2000)])
    data = _dump(e, np.full(4000, 0.1), w)
    ep = analysis.peak_energy_kev(data, 0.0, 0.2)
    assert 240 < ep < 360


def test_polarization_weighted_average():
    data = _dump(
        e_kev=[100, 100, 100],
        theta=[0.1, 0.1, 0.9],  # third photon outside the band
        w=[1.0, 3.0, 100.0],
        q=[0.4, 0.0, 1.0],
        u=[0.0, -0.2, 1.0],
    )
    pi, q, u = analysis.polarization(data, 0.0, 0.2)
    assert q == pytest.approx(0.4 / 4.0)
    assert u == pytest.approx(-0.6 / 4.0)
    assert pi == pytest.approx(np.hypot(0.1, -0.15))
    # empty band
    assert analysis.polarization(data, 2.0, 3.0) == (0.0, 0.0, 0.0)


def test_light_curve_per_frame_luminosity():
    fps = 5.0
    frames = {
        10: _dump([100.0], [0.1], [2.0]),
        11: _dump([100.0, 100.0], [0.1, 0.1], [2.0, 2.0]),
    }
    t, L = analysis.light_curve(frames, fps, 0.0, 0.2)
    np.testing.assert_allclose(t, [2.0, 2.2])
    assert L[1] == pytest.approx(2 * L[0])
    e_erg = 100.0 / ERG_TO_KEV
    assert L[0] == pytest.approx(2.0 * e_erg * fps)


def test_light_curve_toa_binning():
    """Time-of-arrival light curve: photons further along their own direction
    arrive EARLIER (t_obs = t_frame - r.p_hat/c), and in-bin luminosity is
    sum(wE)/dt."""
    fps = 5.0
    frame = 10
    # two photons flying at theta=0.1; the second is 1 light-second ahead
    data = _dump([100.0, 100.0], [0.1, 0.1], [2.0, 6.0])
    nhat = np.array([np.sin(0.1), 0.0, np.cos(0.1)])
    data["R0"] = np.array([0.0, C_LIGHT * nhat[0]])
    data["R1"] = np.zeros(2)
    data["R2"] = np.array([0.0, C_LIGHT * nhat[2]])
    bins = np.array([0.5, 1.5, 2.5])  # 1 s bins around t=1 and t=2
    t, L = analysis.light_curve_toa(data, frame, fps, 0.0, 0.2, t_bins=bins)
    np.testing.assert_allclose(t, [1.0, 2.0])
    e_erg = 100.0 / ERG_TO_KEV
    # photon 2 (ahead by 1 ls) arrives at t = 2 - 1 = 1 s; photon 1 at t = 2 s
    assert L[0] == pytest.approx(6.0 * e_erg)
    assert L[1] == pytest.approx(2.0 * e_erg)


def test_scatterings_histogram_weighted():
    data = _dump([100] * 4, [0.1] * 4, [1.0, 2.0, 3.0, 4.0], ns=[0, 1, 1, 5])
    edges, hist = analysis.scatterings_histogram(data)
    assert hist[0] == pytest.approx(1.0)
    assert hist[1] == pytest.approx(5.0)
    assert hist[5] == pytest.approx(4.0)
