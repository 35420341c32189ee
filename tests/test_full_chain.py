"""Golden full-chain test: geometry-true simulation -> position fix.

The framework's equivalent of the reference's end-to-end golden-file runs
(SURVEY.md §4 mechanism 1): a geometry-consistent multi-SV scenario is
simulated, then the complete receiver (acquire -> track -> LNAV decode ->
pseudoranges -> LSQ) must recover the configured receiver position.
"""

import numpy as np
import pytest

from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                            SignalConfig, TrackConfig)
from gnsstpu.nav.orbits import satpos
from gnsstpu.nav import geodesy
from gnsstpu.nav.types import Ephemeris
from gnsstpu.runtime.receiver import run_receiver
from gnsstpu.runtime.sources import SimSource
from gnsstpu.sim import IFSimulator
from gnsstpu.sim.scenario import build_scenario

BASE_EPH = dict(
    t_oc=266400.0, a_f0=2.45e-4, a_f1=-3.2e-12, a_f2=0.0, T_GD=-4.656e-9,
    sqrtA=5153.712, e=0.0123456, M_0=1.23456, deltan=4.2e-9,
    omega=-1.87654, omega_0=-2.0312, omegaDot=-8.1e-9,
    i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
    C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
    C_ic=-7.45e-8, C_is=1.12e-7, valid=True,
)
RECV_ECEF = np.array([3427947.0, 603774.0, 5326967.0])
TOW0_6S = 44400                      # TOW 266400 s = t_oe (tk ~ 0)
N_MS = 24000

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
CFG = ReceiverConfig(
    signal=SIG,
    acq=AcqConfig(doppler_band=12e3, coherent_ms=2, threshold=2.5),
    track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0),
    nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                  use_tropo=False),
    n_channels=8,
    ms_to_process=N_MS,
)


def visible_ephs(n=6, min_el=15.0):
    """Synthetic constellation; returns {prn: eph} for the n highest SVs."""
    ephs = []
    for k in range(24):
        d = dict(BASE_EPH)
        d["M_0"] = (BASE_EPH["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (BASE_EPH["omega_0"] + 1.1 * k) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (k % 3)
        ephs.append(Ephemeris(**d))
    pos, _ = satpos(TOW0_6S * 6.0, ephs)
    _, el, _ = geodesy.topocent(RECV_ECEF, pos - RECV_ECEF)
    order = np.argsort(-el)[:n]
    assert el[order[-1]] > min_el
    return {int(k) + 1: ephs[k] for k in order}


@pytest.fixture(scope="module")
def receiver_output():
    ephs = visible_ephs(6)
    sats = build_scenario(SIG, ephs, RECV_ECEF, TOW0_6S,
                          duration_s=N_MS / 1000.0, cn0_dbhz=47.0)
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=21)
    src = SimSource(sim, N_MS + 50)
    return ephs, run_receiver(src, CFG, n_ms=N_MS)


def test_acquisition_detects_scenario_svs(receiver_output):
    ephs, out = receiver_output
    assert sorted(ch.prn for ch in out.channels) == sorted(ephs)


def test_ephemeris_decoded_all_channels(receiver_output):
    ephs, out = receiver_output
    assert sorted(out.ephs) == sorted(ephs)
    for prn, dec in out.ephs.items():
        truth = ephs[prn]
        assert dec.IODC == truth.IODC
        lsb = 2.0 ** -19
        assert dec.sqrtA == pytest.approx(
            round(truth.sqrtA / lsb) * lsb, abs=1e-9)
        assert out.tows[prn] == TOW0_6S * 6.0


def test_position_fix(receiver_output):
    ephs, out = receiver_output
    assert out.nav is not None, "no navigation solution produced"
    valid = out.nav.valid
    assert valid.sum() >= 10, f"only {valid.sum()} valid epochs"
    err = np.stack([out.nav.x[valid] - RECV_ECEF[0],
                    out.nav.y[valid] - RECV_ECEF[1],
                    out.nav.z[valid] - RECV_ECEF[2]])
    err3d = np.linalg.norm(err, axis=0)
    assert np.mean(err3d) < 20.0, f"mean 3D error {np.mean(err3d):.1f} m"
    assert np.max(err3d) < 60.0, f"max 3D error {np.max(err3d):.1f} m"
    # DOP sanity (synthetic constellation clusters high in the sky, so
    # geometry is poor-ish; just require finite, stable GDOP).
    assert np.all(out.nav.dop[valid, 0] < 25.0)
    # Geodetic output near truth.
    lat, lon, _ = geodesy.cart2geo(*RECV_ECEF, 5)
    assert abs(np.mean(out.nav.latitude[valid]) - lat) < 1e-3
    assert abs(np.mean(out.nav.longitude[valid]) - lon) < 1e-3


def test_velocity_solution_static_receiver(receiver_output):
    """The Doppler velocity LSQ runs per epoch and reports ~zero velocity
    for the static scenario receiver, with small clock drift."""
    _, out = receiver_output
    assert out.nav.vel_valid.sum() >= 10
    v = np.stack([out.nav.vx, out.nav.vy, out.nav.vz], axis=1)
    speed = np.linalg.norm(v[out.nav.vel_valid], axis=1)
    assert np.mean(speed) < 2.0, f"mean speed {np.mean(speed):.2f} m/s"
    assert np.max(speed) < 8.0, f"max speed {np.max(speed):.2f} m/s"
    assert np.all(np.abs(out.nav.ddt[out.nav.vel_valid]) < 20.0)


def test_clock_steering_epoch_navigator(receiver_output):
    """With clock_steering on, navigate applies a rate correction derived
    from the solved clock drift; the position fix is unaffected at the
    tested timescale and steer_s stays bounded by |ddt|/c * run length."""
    from gnsstpu.nav import pvt as pvt_mod

    ephs, out = receiver_output
    good = [c for c, ch in enumerate(out.channels)
            if ch.prn in out.ephs and out.syncs[c].found]
    tow = out.tows[out.channels[good[0]].prn]
    nav_cfg = NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                        use_tropo=False, clock_steering=True)
    nav = pvt_mod.navigate(
        abs_sample=out.track.abs_sample[good],
        prns=[out.channels[c].prn for c in good],
        subframe_start_ms=[out.syncs[c].first_subframe_ms for c in good],
        tow_s=tow, ephs=out.ephs, sig=SIG, nav=nav_cfg,
        n_ms=N_MS, carr_freq=out.track.carr_freq[good])
    valid = nav.valid
    assert valid.sum() >= 10
    err3d = np.linalg.norm(
        np.stack([nav.x, nav.y, nav.z], 1)[valid] - RECV_ECEF, axis=1)
    assert np.mean(err3d) < 20.0
    assert np.all(np.isfinite(nav.steer_s))
    # |steer| bounded by max drift over the run duration.
    bound = 25.0 / 299792458.0 * (N_MS / 1000.0)
    assert np.max(np.abs(nav.steer_s)) <= bound
