"""Live-runtime coverage for the multi-ms and dual-component families.

VERDICT r2 item 4: the ChannelManager must drive Galileo E1 (4 ms code
periods, double-estimator) and GLONASS L3 (data+pilot) in the LIVE
runtime — not only the offline drivers — and a configured signal with no
live-nav support must say so loudly instead of silently never navigating.
"""

import io
import json

import numpy as np

from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                            SignalConfig, TrackConfig)
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.navigator import OnlineNavigator
from gnsstpu.runtime.sources import SimSource
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.signals import galileo_e1, glonass_l3


GSIG = SignalConfig(signal="galileo_e1b", if_freq=0.0, fs=4.2e6,
                    code_freq=galileo_e1.SUB_FREQ,
                    code_length=galileo_e1.SUB_LENGTH)


def test_manager_live_galileo_tracks_and_decodes():
    """Live manager on E1B: acquisition -> 4 ms-block double-estimator
    slots -> I/NAV ephemeris decode from the accumulating history via
    OnlineNavigator (single SV; the full multi-SV live fix is covered by
    the offline scenario test + the GLONASS live-fix test)."""
    from tests.test_galileo import make_galeph
    from gnsstpu.nav import galileo as gal

    eph = make_galeph()
    rng = np.random.default_rng(5)
    filler = rng.choice([-1.0, 1.0], 130)
    syms = np.concatenate([filler,
                           gal.encode_frames(eph, tow0=345600, n_pages=6)])
    sat = SatParams(prn=11, doppler_hz=1234.0, code_phase_chips=3210.5,
                    cn0_dbhz=48.0, nav_bits=syms)
    sim = IFSimulator(GSIG, [sat], noise_sigma=1.0, seed=4)
    n_blocks = len(syms) + 8
    n_ms = n_blocks * 4
    src = SimSource(sim, int((n_blocks + 8) * GSIG.code_period_ms))

    cfg = ReceiverConfig(
        signal=GSIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=1, threshold=2.2,
                      doppler_step=75.0, prn_list=(11,)),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0,
                          fll_bw=50.0, sll_bw=0.5, sll_spacing=0.25,
                          aid_div=1540.0),
        n_channels=2)
    sink = io.StringIO()
    navr = OnlineNavigator(GSIG, NavConfig(sol_period_ms=500),
                           retry_ms=500)
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=400, reacq_period_ms=10 ** 9,
                         confirm_epochs=3, navigator=navr,
                         sync_every=2)
    recs = mgr.run(n_ms - 800)

    assert mgr.engine.startswith("boc")
    # The slot confirmed and held lock at the right Doppler.
    states = {s.prn: s.state for s in mgr.slots}
    assert states.get(11) is SlotState.TRACKING
    last = recs[-1]
    i11 = list(last.prn).index(11)
    assert abs(last.doppler_hz[i11] - 1234.0) < 5.0
    assert last.cn0_dbhz[i11] > 40.0
    # Live ephemeris decode happened mid-run from the 4 ms history.
    assert 11 in navr.decoded
    dec = navr.decoded[11][2]
    assert dec.IODnav == eph.IODnav and dec.sqrtA == dec.sqrtA
    evs = [json.loads(l) for l in sink.getvalue().splitlines()
           if '"event"' in l]
    assert any(e["what"] == "ephemeris_decoded" and e["prn"] == 11
               for e in evs)


L3SIG = SignalConfig(signal="glonass_l3oc", if_freq=-2.025e6, fs=24.0e6,
                     code_freq=glonass_l3.CODE_FREQ,
                     code_length=glonass_l3.CODE_LENGTH)


def test_manager_live_l3_tracks_and_warns_no_nav():
    """Live manager on L3OC: pilot acquisition -> dual-code slots
    (data+pilot accumulators in the history) -> loud telemetry that the
    signal has no live-nav support (reference L3 receiver scope is
    acq+track only, GLONASS/L3/initSettings.sci)."""
    from gnsstpu.nav.glonass_l3 import sync_overlay
    from tests.test_glonass_l3 import overlay_streams

    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 8).astype(np.int8)
    n_ms = 560
    pilot_ov, data_ov, _ = overlay_streams(bits, n_ms + 60)
    prn = 7
    common = dict(doppler_hz=1800.0, code_phase_chips=4321.25,
                  cn0_dbhz=50.0)
    sats = [
        SatParams(prn=glonass_l3.pilot_prn(prn), nav_bits=pilot_ov,
                  carrier_phase=0.0, **common),
        SatParams(prn=glonass_l3.data_prn(prn), nav_bits=data_ov,
                  carrier_phase=np.pi / 2, **common),
    ]
    sim = IFSimulator(L3SIG, sats, noise_sigma=1.0, seed=6)
    src = SimSource(sim, n_ms + 40)

    cfg = ReceiverConfig(
        signal=L3SIG,
        acq=AcqConfig(doppler_band=5e3, coherent_ms=1, threshold=2.5,
                      doppler_step=250.0, prn_list=(prn,)),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3, pll_bw=25.0,
                          fll_bw=250.0,
                          aid_div=glonass_l3.CARRIER_HZ
                          / glonass_l3.CODE_FREQ),
        n_channels=1)
    sink = io.StringIO()
    navr = OnlineNavigator(L3SIG, NavConfig())
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, reacq_period_ms=10 ** 9,
                         navigator=navr, prn_pool=[prn], sync_every=2)
    recs = mgr.run(500)

    assert mgr.engine.startswith("dual")
    last = recs[-1]
    assert int(last.prn[0]) == prn
    assert abs(last.doppler_hz[0] - 1800.0) < 5.0
    assert last.cn0_dbhz[0] > 42.0
    # Data-component prompts accumulated in the history (q_p2 carries
    # the quadrature data channel) and the pilot NH overlay is visible.
    h = mgr.prompt_stream(prn)
    assert "i_p2" in h and len(h["i_p2"]) == len(h["i_p"])
    sync = sync_overlay(h["i_p"][200:])
    assert sync.found and sync.quality >= 0.75
    # Loud no-live-nav event, exactly once.
    evs = [json.loads(l) for l in sink.getvalue().splitlines()
           if '"event"' in l]
    warn = [e for e in evs if e["what"] == "live_nav_unsupported"]
    assert len(warn) == 1 and warn[0]["signal"] == "glonass_l3oc"


def test_manager_online_navigation_galileo():
    """LIVE Galileo receiver parity with the reference's Ephemeris+PVT
    threads (mirrors test_manager_online_navigation_glonass): the
    ChannelManager drives 4 ms double-estimator slots for a 5-SV E1B
    constellation, OnlineNavigator decodes I/NAV ephemerides from the
    accumulating block history mid-run and streams LSQ fixes as pvt
    telemetry."""
    from tests.test_galileo import (GAL_RECV, GAL_TOW0,
                                    make_gal_constellation)
    from gnsstpu.sim.scenario import build_scenario_galileo

    n_per = 3600                        # 4 ms periods (14.4 s)
    ephs = make_gal_constellation(5)
    sats, qephs = build_scenario_galileo(
        GSIG, ephs, GAL_RECV, GAL_TOW0,
        duration_s=n_per * GSIG.code_period_s, cn0_dbhz=48.0, n_pages=7)
    sim = IFSimulator(GSIG, sats, noise_sigma=1.0, seed=23)
    src = SimSource(sim, int((n_per + 8) * GSIG.code_period_ms))
    cfg = ReceiverConfig(
        signal=GSIG,
        acq=AcqConfig(doppler_band=9e3, coherent_ms=1, threshold=2.2,
                      doppler_step=75.0, prn_list=tuple(sorted(qephs))),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0,
                          fll_bw=50.0, sll_bw=0.5, sll_spacing=0.25,
                          aid_div=1540.0),
        n_channels=5)
    sink = io.StringIO()
    navr = OnlineNavigator(
        GSIG, NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                        use_tropo=False), retry_ms=800)
    # prefetch=True: the BOC engine's 4 ms-block superepoch program
    # runs through the pipelined dispatch path (engine-generic check).
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=400, reacq_period_ms=10 ** 9,
                         confirm_epochs=3, navigator=navr, sync_every=2,
                         prefetch=True)
    mgr.run(n_per * 4 - 1600)

    assert sorted(navr.decoded) == sorted(qephs)
    sols = navr.solutions
    assert len(sols) >= 4, f"only {len(sols)} online Galileo fixes"
    err = np.array([np.linalg.norm([s["x"] - GAL_RECV[0],
                                    s["y"] - GAL_RECV[1],
                                    s["z"] - GAL_RECV[2]]) for s in sols])
    assert np.mean(err) < 30.0, f"mean 3D error {np.mean(err):.1f} m"
    pvts = [json.loads(l) for l in sink.getvalue().splitlines()
            if '"type": "pvt"' in l]
    assert len(pvts) == len(sols)


def test_manager_online_navigation_beidou():
    """LIVE BeiDou receiver parity (mirrors the GPS/GLONASS/Galileo live
    tests): ChannelManager + OnlineNavigator decode D1 ephemerides from
    the accumulating NH(20)-wiped history mid-run and stream LSQ
    position fixes as pvt telemetry."""
    from tests.test_beidou import (BD_NMS, BD_RECV, BD_SOW0,
                                   make_bd_constellation)
    from gnsstpu.sim.scenario import build_scenario_beidou

    sig = SignalConfig(signal="beidou_b1i", if_freq=0.0, fs=4.096e6,
                       code_freq=2.046e6, code_length=2046,
                       complex_iq=True)
    # D1 ephemerides span subframes 1-3 = 18 s, so a channel that needs
    # one re-acquisition still has to fit sync + 18 s of clean history.
    n_ms = BD_NMS + 8000
    ephs = make_bd_constellation(5)
    sats, qephs = build_scenario_beidou(
        sig, ephs, BD_RECV, BD_SOW0, duration_s=n_ms / 1000.0,
        cn0_dbhz=48.0, n_subframes=5)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=17)
    src = SimSource(sim, n_ms + 60)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=12e3, coherent_ms=1, threshold=2.0,
                      doppler_step=125.0, prn_list=tuple(sorted(qephs))),
        track=TrackConfig(dll_bw=1.5, pll_bw=25.0, fll_bw=150.0,
                          fll_disc="atan",
                          aid_div=1561.098e6 / 2.046e6),
        n_channels=5)
    sink = io.StringIO()
    navr = OnlineNavigator(
        sig, NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                       use_tropo=False), retry_ms=500)
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, reacq_period_ms=2000,
                         confirm_epochs=12, navigator=navr, sync_every=4)
    mgr.run(n_ms)

    assert sorted(navr.decoded) == sorted(qephs)
    sols = navr.solutions
    assert len(sols) >= 4, f"only {len(sols)} online BeiDou fixes"
    err = np.array([np.linalg.norm([s["x"] - BD_RECV[0],
                                    s["y"] - BD_RECV[1],
                                    s["z"] - BD_RECV[2]]) for s in sols])
    assert np.mean(err) < 30.0, f"mean 3D error {np.mean(err):.1f} m"
    pvts = [json.loads(l) for l in sink.getvalue().splitlines()
            if '"type": "pvt"' in l]
    assert len(pvts) == len(sols)
