"""Integrated carrier-phase measurement stream (tracking.carrier).

The host-side accumulator must mirror the device correlator's uint32
carrier NCO BIT-EXACTLY (same f32 step rounding, same post-block
Doppler semantics), and the integrated phase must follow the truth
carrier to phase-lock accuracy (the reference's TakeMeasurements
carrier observable, objects/correlator.cpp:263-357).
"""

import io

import numpy as np

from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                            TrackConfig)
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.sources import ArraySource
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)

SATS = [
    SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
              cn0_dbhz=47.0),
    SatParams(prn=12, doppler_hz=-1500.0, code_phase_chips=700.25,
              cn0_dbhz=46.0),
]


def _run(sync_every=2, n_ms=700, prefetch=False, **kw):
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    src = ArraySource(np.asarray(sim.generate(n_ms + 60)))
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, reacq_period_ms=400, cn0_drop_dbhz=35.0,
        prn_pool=[5, 12], sync_every=sync_every, prefetch=prefetch,
        **kw)
    recs = mgr.run(n_ms)
    return mgr, recs


def test_u32_nco_parity():
    """The accumulator's predicted uint32 phase equals the device
    correlator state's carr_phase_u32 — bit-exact, per channel."""
    mgr, _ = _run()
    checked = 0
    state_u32 = np.asarray(mgr._state.corr.carr_phase_u32)
    for i, s in enumerate(mgr.slots):
        if s.state is SlotState.IDLE:
            continue
        acc = mgr.history[s.prn]["_cph"]
        assert acc.phase_u32 == int(state_u32[i]), s.prn
        checked += 1
    assert checked == 2


def test_carrier_phase_tracks_truth_doppler():
    """Integrated carrier phase over the locked span advances at the
    truth Doppler rate: the PLL is phase-locked, so the accumulated
    error stays sub-cycle (cm-level at L1) rather than growing."""
    mgr, _ = _run(n_ms=900)
    for sat in SATS:
        h = mgr.prompt_stream(sat.prn)
        cyc = h["carr_cycles"]
        t = h["abs_sample"] / SIG.fs
        # Skip the pull-in transient; compare the locked tail.
        a, b = 200, len(cyc) - 1
        dphi = cyc[b] - cyc[a]
        dt = t[b] - t[a]
        assert dt > 0.3
        err_cycles = dphi - sat.doppler_hz * dt
        assert abs(err_cycles) < 0.05, (sat.prn, err_cycles)


def test_carrier_phase_serial_prefetch_parity():
    """The carrier-phase stream is identical between the serial and
    prefetch pipelines (it derives from the same observables)."""
    m1, _ = _run(sync_every=4)
    mp, _ = _run(sync_every=4, prefetch=True)
    for prn in (5, 12):
        np.testing.assert_array_equal(
            m1.prompt_stream(prn)["carr_cycles"],
            mp.prompt_stream(prn)["carr_cycles"])
        assert (m1.history[prn]["_cph"].phase_u32
                == mp.history[prn]["_cph"].phase_u32)


def test_compact_readback_tracks_and_preserves_nco_parity():
    """readback='compact' (f16 prompts/rem, i16 blksize delta, f32
    Doppler) must still acquire, confirm and track — and because the
    Doppler/blksize lanes stay exact, the u32 carrier-NCO mirror stays
    BIT-EXACT."""
    mgr, recs = _run(sync_every=4, prefetch=True, readback="compact")
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i5 = list(last.prn).index(5)
    assert abs(last.doppler_hz[i5] - 900.0) < 5.0
    assert last.cn0_dbhz[i5] > 40.0
    state_u32 = np.asarray(mgr._state.corr.carr_phase_u32)
    for i, s in enumerate(mgr.slots):
        if s.state is not SlotState.IDLE:
            acc = mgr.history[s.prn]["_cph"]
            assert acc.phase_u32 == int(state_u32[i])
    # And the full-precision run agrees with compact on the exact lanes.
    m32, _ = _run(sync_every=4, prefetch=True)
    for prn in (5, 12):
        np.testing.assert_array_equal(
            m32.prompt_stream(prn)["carr_doppler"],
            mgr.prompt_stream(prn)["carr_doppler"])
        np.testing.assert_array_equal(
            m32.prompt_stream(prn)["carr_cycles"],
            mgr.prompt_stream(prn)["carr_cycles"])


def test_measurement_stream_phase_rate_matches_truth():
    """navigate(collect_meas=True, carr_cycles=...) latches carrier
    phase per measurement epoch and derives a phase-rate range rate;
    on geometry-exact synthetic streams both the latched phase deltas
    and prr_phase agree with the truth range rate to mm/s (far below
    Doppler-discriminator noise) — the reference's Measurement_M
    carrier observables (objects/correlator.cpp:263-357)."""
    from gnsstpu.config import NavConfig
    from gnsstpu.nav import pvt
    from gnsstpu.nav.pvt import SPEED_OF_LIGHT
    from gnsstpu.nav.types import Ephemeris
    from gnsstpu.sim.scenario import signal_delay

    BASE = dict(
        t_oc=266400.0, a_f0=0.0, a_f1=0.0, a_f2=0.0, T_GD=0.0,
        sqrtA=5153.712, e=0.0123456, M_0=1.23456, deltan=4.2e-9,
        omega=-1.87654, omega_0=-2.0312, omegaDot=-8.1e-9,
        i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
        C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
        C_ic=-7.45e-8, C_is=1.12e-7, valid=True,
    )
    recv = np.array([3427947.0, 603774.0, 5326967.0])
    tow0 = 266400.0
    # Visible synthetic constellation (test_full_chain.visible_ephs
    # recipe): spread M_0/omega_0 around the orbit, keep the 5 highest.
    from gnsstpu.nav import geodesy
    from gnsstpu.nav.orbits import satpos
    cand = []
    for j in range(24):
        d = dict(BASE)
        d["M_0"] = (BASE["M_0"] + 2.1 * j) % (2 * np.pi) - np.pi
        d["omega_0"] = (BASE["omega_0"] + 1.1 * j) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (j % 3)
        cand.append(Ephemeris(**d))
    pos, _ = satpos(tow0, cand)
    _, el, _ = geodesy.topocent(recv, pos - recv)
    order = np.argsort(-el)[:5]
    prns = [int(j) + 1 for j in order]
    ephs = {int(j) + 1: cand[j] for j in order}
    n_ms = 2500
    T = SIG.code_period_s
    fs = SIG.fs
    f_carr = 1575.42e6
    abs_sample = np.zeros((len(prns), n_ms))
    carr_cycles = np.zeros((len(prns), n_ms))
    carr_freq = np.zeros((len(prns), n_ms))
    tau_all = np.zeros((len(prns), n_ms))
    for i, p in enumerate(prns):
        for m in range(n_ms):
            t_tx = tow0 + m * T
            r = t_tx + 0.075
            for _ in range(4):
                r = t_tx + signal_delay(ephs[p], recv, r)
            tau = r - t_tx
            tau_all[i, m] = tau
            abs_sample[i, m] = (r - tow0) * fs
            # Baseband (IF=0): integrated carrier phase is the Doppler
            # integral -f_carr * (tau - tau0).
            carr_cycles[i, m] = -f_carr * (tau - tau_all[i, 0])
        carr_freq[i, 1:] = (-f_carr * np.diff(tau_all[i])
                            / np.diff(abs_sample[i] / fs))
        carr_freq[i, 0] = carr_freq[i, 1]

    nav_cfg = NavConfig(sol_period_ms=500, elevation_mask_deg=5.0,
                        use_tropo=False)
    sol = pvt.navigate(
        abs_sample=abs_sample, prns=prns,
        subframe_start_ms=[0] * len(prns), tow_s=tow0, ephs=ephs,
        sig=SIG, nav=nav_cfg, n_ms=n_ms, carr_freq=carr_freq,
        collect_meas=True, carr_cycles=carr_cycles)
    assert sol.valid.sum() >= 3
    # Position sanity: geometry-exact streams recover the receiver (the
    # relative-pseudorange convention leaves a small common-mode error,
    # same class as the reference's post-processing fix accuracy).
    k = np.nonzero(sol.valid)[0][-1]
    err = np.linalg.norm([sol.x[k] - recv[0], sol.y[k] - recv[1],
                          sol.z[k] - recv[2]])
    assert err < 300.0, err
    # Measurement records: every epoch latches carrier phase; from the
    # second epoch on, prr_phase (latched phase deltas) matches BOTH
    # the Doppler-derived prr and the truth range rate c*dtau/dt to
    # mm/s (independent code paths; exact synthetic streams).
    assert len(sol.meas) >= 3
    step_ms = 500
    for n_meas, m in enumerate(sol.meas):
        assert "carr_phase" in m and "prr_phase" in m
        if n_meas == 0:
            continue
        pp = np.asarray(m["prr_phase"])
        pr = np.asarray(m["prr"])
        assert np.isfinite(pp).all()
        # prr_phase is centered half a solution period back, prr half
        # its 100 ms Doppler window back: they differ by range
        # acceleration x ~0.2 s, not by noise.
        assert np.max(np.abs(pp - pr)) < 0.5, np.abs(pp - pr).max()
        k_ms = int(round(m["t_ms"]))
        for j, p in enumerate(m["prns"]):
            i = prns.index(p)
            truth = (SPEED_OF_LIGHT
                     * (tau_all[i, k_ms] - tau_all[i, k_ms - step_ms])
                     / ((abs_sample[i, k_ms] - abs_sample[i, k_ms
                         - step_ms]) / fs))
            assert abs(pp[j] - truth) < 5e-3, (p, pp[j] - truth)


def test_compact_readback_serial_path():
    """Serial (non-prefetch) compact readback goes through the
    tuple-leaf decode branch; tracking and the exact-lane parity with
    the f32 wire must hold there too."""
    mgr, recs = _run(sync_every=4, readback="compact")
    last = recs[-1]
    assert {int(p) for p in last.prn if p} == {5, 12}
    m32, _ = _run(sync_every=4)
    for prn in (5, 12):
        np.testing.assert_array_equal(
            m32.prompt_stream(prn)["carr_doppler"],
            mgr.prompt_stream(prn)["carr_doppler"])
        np.testing.assert_array_equal(
            m32.prompt_stream(prn)["carr_cycles"],
            mgr.prompt_stream(prn)["carr_cycles"])
