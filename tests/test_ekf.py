"""Navigation EKF tests: fixture-by-construction trajectories.

The reference's EKF surfaces via telemetry/GUI (gse gui_ekf,
matlab/analyze_ekf.m); here the filter itself is checked: convergence to
a static truth, tracking a constant-velocity receiver, innovation gating
of a faulted pseudorange (the pvt.cpp:864-style measurement screen).
"""

import numpy as np

from gnsstpu.config import SPEED_OF_LIGHT
from gnsstpu.nav.ekf import EkfConfig, NavEkf, satpos_vel
from tests.test_pvt import make_constellation

T0 = 266400.0
P_TRUE = np.array([2849830.0, 2186822.0, 5252937.0])  # ~ (55N, 37.5E)


def measure(ephs, t, p_rcv, bias_m, v_rcv=None, drift_ms=0.0):
    """Noise-free pseudoranges (+rates) with Sagnac, no tropo."""
    pos, vel, clk = satpos_vel(t, ephs)
    pr = np.zeros(len(ephs))
    prr = np.zeros(len(ephs))
    for i in range(len(ephs)):
        # iterate the Sagnac/range fixed point like the LSQ tests
        rho = np.linalg.norm(pos[i] - p_rcv)
        for _ in range(3):
            from gnsstpu.nav import geodesy
            rot = geodesy.e_r_corr(np.array([rho / SPEED_OF_LIGHT]),
                                   pos[i][None])[0]
            rho = np.linalg.norm(rot - p_rcv)
        pr[i] = rho + bias_m
        u = (rot - p_rcv) / rho
        v = np.zeros(3) if v_rcv is None else v_rcv
        prr[i] = u @ (vel[i] - v) + drift_ms
    return pr, prr, pos, vel


def test_static_convergence():
    ephs = make_constellation(7)
    bias = 920.0
    x0 = np.zeros(8)
    x0[0:3] = P_TRUE + np.array([60.0, -45.0, 80.0])
    x0[6] = 0.0
    ekf = NavEkf(x0, EkfConfig(use_tropo=False))
    rng = np.random.default_rng(7)
    for k in range(30):
        t = T0 + k
        pr, prr, pos, vel = measure(ephs, t, P_TRUE, bias)
        pr = pr + rng.normal(0, 2.0, len(pr))
        st = ekf.step(1.0 if k else 0.0, pos, pr, vel, prr)
        assert st.accepted.all() or k == 0
    assert np.linalg.norm(ekf.x[0:3] - P_TRUE) < 5.0
    assert abs(ekf.x[6] - bias) < 5.0
    assert np.linalg.norm(ekf.x[3:6]) < 0.5


def test_constant_velocity_tracking():
    ephs = make_constellation(7)
    v_true = np.array([12.0, -7.0, 3.0])
    bias, drift = 500.0, 1.5
    x0 = np.zeros(8)
    x0[0:3] = P_TRUE
    x0[6] = bias
    ekf = NavEkf(x0, EkfConfig(use_tropo=False, q_accel=0.5))
    for k in range(40):
        t = T0 + k
        p_k = P_TRUE + v_true * k
        b_k = bias + drift * k
        pr, prr, pos, vel = measure(ephs, t, p_k, b_k, v_true, drift)
        ekf.step(1.0 if k else 0.0, pos, pr, vel, prr)
    assert np.linalg.norm(ekf.x[3:6] - v_true) < 0.2
    assert abs(ekf.x[7] - drift) < 0.2
    assert np.linalg.norm(ekf.x[0:3] - (P_TRUE + v_true * 39)) < 3.0


def test_innovation_gate_rejects_fault():
    ephs = make_constellation(7)
    x0 = np.zeros(8)
    x0[0:3] = P_TRUE
    ekf = NavEkf(x0, EkfConfig(use_tropo=False))
    # converge first
    for k in range(10):
        pr, prr, pos, vel = measure(ephs, T0 + k, P_TRUE, 0.0)
        ekf.step(1.0 if k else 0.0, pos, pr)
    pr, prr, pos, vel = measure(ephs, T0 + 10, P_TRUE, 0.0)
    pr[3] += 5000.0  # gross fault (e.g. cross-correlation track)
    st = ekf.step(1.0, pos, pr)
    assert not st.accepted[3]
    assert st.accepted.sum() == len(ephs) - 1
    assert np.linalg.norm(ekf.x[0:3] - P_TRUE) < 5.0


def test_satpos_vel_consistent_with_positions():
    ephs = make_constellation(3)
    pos, vel, clk = satpos_vel(T0, ephs)
    from gnsstpu.nav.orbits import satpos
    p2, _ = satpos(T0 + 2.0, ephs)
    drift = p2 - (pos + 2.0 * vel)
    assert np.all(np.linalg.norm(drift, axis=1) < 2.5)  # ~0.5*a*t^2, a~0.6 m/s^2


def test_live_ekf_mode_beats_lsq_scatter(tmp_path):
    """OnlineNavigator(mode='ekf') in the LIVE manager loop: the filter
    is seeded from the first LSQ fix, fuses each epoch's pseudoranges +
    Doppler rates, streams 'ekf' telemetry, and its position scatter on
    a noisy run beats the snapshot LSQ scatter (reference gse gui_ekf /
    matlab analyze_ekf.m role)."""
    import json

    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                SignalConfig, TrackConfig)
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.navigator import OnlineNavigator
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.sim import IFSimulator
    from gnsstpu.sim.scenario import build_scenario_glonass
    from tests.test_glonass import (GFIX_RECV, GFIX_T0,
                                    make_glonass_constellation)

    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=4.096e6,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    n_ms = 12000
    gephs = make_glonass_constellation(GFIX_RECV, n=6)
    # Noisier than the LSQ fix test (44 dB-Hz): the filter has scatter
    # to win back.
    sats, qephs = build_scenario_glonass(
        sig, gephs, GFIX_RECV, GFIX_T0, duration_s=n_ms / 1000.0,
        cn0_dbhz=44.0, n_strings=6)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=31)
    src = SimSource(sim, n_ms + 60)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=14e3, coherent_ms=2, threshold=2.5,
                      prn_list=tuple(qephs), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0,
                          aid_div=1602e6 / 0.511e6),
        n_channels=6)
    log = tmp_path / "telemetry.jsonl"
    navr = OnlineNavigator(
        sig, NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                       use_tropo=False),
        retry_ms=300, mode="ekf")
    with open(log, "w") as sink:
        mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                             epoch_ms=100, reacq_period_ms=10 ** 9,
                             confirm_epochs=6, navigator=navr,
                             sync_every=4)
        mgr.run(n_ms)

    assert navr.ekf is not None and len(navr.ekf_track) >= 6
    # Compare scatter over the common settled window (skip the filter's
    # first 2 epochs of convergence).
    ek_t = {r["t_ms"] for r in navr.ekf_track[2:]}
    ek = np.array([[r["x"], r["y"], r["z"]]
                   for r in navr.ekf_track[2:]])
    ls = np.array([[s["x"], s["y"], s["z"]] for s in navr.solutions
                   if s["t_ms"] in ek_t])
    assert len(ls) == len(ek)
    err_ek = np.linalg.norm(ek - GFIX_RECV[None, :], axis=1)
    err_ls = np.linalg.norm(ls - GFIX_RECV[None, :], axis=1)
    assert err_ek.mean() < err_ls.mean(), (
        f"EKF {err_ek.mean():.1f} m !< LSQ {err_ls.mean():.1f} m")
    assert err_ek.mean() < 25.0

    # 'ekf' records went out live and the analyze panel consumes them.
    recs = [json.loads(l) for l in log.read_text().splitlines()
            if '"ekf"' in l]
    assert len(recs) == len(navr.ekf_track)
    from gnsstpu import viz
    png = tmp_path / "ekf.png"
    assert viz.plot_ekf_log(str(log), str(png))
    assert png.exists() and png.stat().st_size > 1000


def test_live_ekf_phase_rate_mode_converges(tmp_path):
    """phase_rate=True (range rate from integrated-carrier-phase
    deltas): the live EKF still converges to the truth position. The
    phase-rate observation is centered half a solution period back
    (documented lag), so this asserts convergence, not superiority."""
    import io

    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                SignalConfig, TrackConfig)
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.navigator import OnlineNavigator
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.sim import IFSimulator
    from gnsstpu.sim.scenario import build_scenario_glonass
    from tests.test_glonass import (GFIX_RECV, GFIX_T0,
                                    make_glonass_constellation)

    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=4.096e6,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    n_ms = 12000
    gephs = make_glonass_constellation(GFIX_RECV, n=6)
    sats, qephs = build_scenario_glonass(
        sig, gephs, GFIX_RECV, GFIX_T0, duration_s=n_ms / 1000.0,
        cn0_dbhz=44.0, n_strings=6)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=31)
    src = SimSource(sim, n_ms + 60)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=14e3, coherent_ms=2, threshold=2.5,
                      prn_list=tuple(qephs), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0,
                          aid_div=1602e6 / 0.511e6),
        n_channels=6)
    navr = OnlineNavigator(
        sig, NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                       use_tropo=False),
        retry_ms=300, mode="ekf", phase_rate=True)
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=io.StringIO()),
                         epoch_ms=100, reacq_period_ms=10 ** 9,
                         confirm_epochs=6, navigator=navr,
                         sync_every=4)
    mgr.run(n_ms)
    assert navr.ekf is not None and len(navr.ekf_track) >= 6
    ek = np.array([[r["x"], r["y"], r["z"]]
                   for r in navr.ekf_track[2:]])
    err = np.linalg.norm(ek - GFIX_RECV[None, :], axis=1)
    assert err.mean() < 25.0, err.mean()
