"""Subframe 4/5 page codec tests: almanac and iono/UTC roundtrip,
almanac-driven visibility warm start.

Fixture-by-construction (SURVEY.md §4): encode pages through the real
parity chain, decode through the real checked-subframe walk, require
quantization-exact field recovery (the realtime receiver's
ephemeris.cpp:425/:314 decode role).
"""

import numpy as np
import pytest

from gnsstpu.nav import almanac as alm_mod
from gnsstpu.nav import lnav
from gnsstpu.nav.almanac import Almanac, IonoUtc
from gnsstpu.nav.types import Ephemeris


def make_almanac(prn: int) -> Almanac:
    return Almanac(
        prn=prn, e=0.0123, t_oa=319488.0, delta_i=0.02 * np.pi / 4,
        omegaDot=-8.1e-9, health=0, sqrtA=5153.6,
        omega_0=1.25 + 0.01 * prn, omega=-0.75,
        M_0=((0.5 * prn - 2.0 + np.pi) % (2 * np.pi)) - np.pi,
        a_f0=-3.2e-5, a_f1=1.8e-12)


def make_ionoutc() -> IonoUtc:
    return IonoUtc(
        alpha0=1.1176e-8, alpha1=-7.4506e-9, alpha2=-5.9605e-8,
        alpha3=1.1921e-7, beta0=90112.0, beta1=-32768.0, beta2=-196608.0,
        beta3=-65536.0, A1=-8.88e-15, A0=3.26e-9, t_ot=405504.0,
        WN_t=138, dt_ls=18, WN_lsf=137, DN=7, dt_lsf=18)


def encode_pages_stream(pages, tow0=1000):
    """Encode a 4/5 subframe stream carrying the given page word lists."""
    d29s = d30s = 0
    bits = []
    eph = Ephemeris()
    for k, (sf_id, words) in enumerate(pages):
        sf, d29s, d30s = lnav.encode_subframe(
            eph, sf_id, (tow0 + k + 1) % 100800, d29s, d30s,
            page_words=words)
        bits.append(sf)
    return np.concatenate(bits)


def test_almanac_page_roundtrip():
    alms = {p: make_almanac(p) for p in (1, 7, 24, 32)}
    iu = make_ionoutc()
    pages = ([(5, alm_mod.almanac_page_words(a)) for a in alms.values()]
             + [(4, alm_mod.iono_utc_page_words(iu))])
    bits = encode_pages_stream(pages)
    got_alms, got_iu, n_clean = alm_mod.decode_pages(bits)
    assert sorted(got_alms) == [1, 7, 24, 32]
    assert n_clean == len(pages)
    for p, a in alms.items():
        g = got_alms[p]
        for field, lsb in [
                ("e", 2.0 ** -21), ("t_oa", 2.0 ** 12),
                ("delta_i", 2.0 ** -19 * np.pi),
                ("omegaDot", 2.0 ** -38 * np.pi),
                ("sqrtA", 2.0 ** -11), ("omega_0", 2.0 ** -23 * np.pi),
                ("omega", 2.0 ** -23 * np.pi),
                ("M_0", 2.0 ** -23 * np.pi),
                ("a_f0", 2.0 ** -20), ("a_f1", 2.0 ** -38)]:
            want = round(getattr(a, field) / lsb) * lsb
            assert getattr(g, field) == pytest.approx(
                want, rel=1e-12, abs=1e-30), (p, field)
    assert got_iu is not None
    for field, lsb in [
            ("alpha0", 2.0 ** -30), ("alpha1", 2.0 ** -27),
            ("alpha2", 2.0 ** -24), ("alpha3", 2.0 ** -24),
            ("beta0", 2.0 ** 11), ("beta1", 2.0 ** 14),
            ("beta2", 2.0 ** 16), ("beta3", 2.0 ** 16),
            ("A1", 2.0 ** -50), ("A0", 2.0 ** -30), ("t_ot", 2.0 ** 12)]:
        want = round(getattr(iu, field) / lsb) * lsb
        assert getattr(got_iu, field) == pytest.approx(
            want, rel=1e-12, abs=1e-30), field
    for field in ("WN_t", "dt_ls", "WN_lsf", "DN", "dt_lsf"):
        assert getattr(got_iu, field) == getattr(iu, field)


def test_corrupted_page_rejected():
    bits = encode_pages_stream(
        [(5, alm_mod.almanac_page_words(make_almanac(9)))])
    bad = bits.copy()
    bad[100] ^= 1          # parity break in word 4
    alms, _, n_clean = alm_mod.decode_pages(bad)
    assert 9 not in alms
    assert n_clean == 0


def test_almanac_visibility_warm_start():
    """Almanac -> reduced ephemeris -> SV_Predict-style az/el/Doppler:
    the satellite placed overhead must predict visible with small
    Doppler; an orthogonal-plane one must be masked (sv_select.cpp
    SV_Predict role)."""
    from gnsstpu.config import SPEED_OF_LIGHT
    from gnsstpu.nav import visibility
    from gnsstpu.nav.orbits import satpos

    alm = make_almanac(3)
    eph = alm.to_ephemeris()
    t = alm.t_oa
    pos, _ = satpos(np.array([t]), [eph])
    # Receiver directly under the satellite (scaled to Earth surface).
    rx = pos[0] / np.linalg.norm(pos[0]) * 6371e3
    preds = visibility.predict({3: eph}, t, rx, carrier_hz=1575.42e6,
                               mask_deg=10.0)
    p = preds[0]
    assert p.visible and p.el_deg > 80.0
    assert abs(p.doppler_hz) < 1200.0      # near-zenith: small range rate
    # Receiver on the opposite side of the Earth: not visible.
    preds2 = visibility.predict({3: eph}, t, -rx, carrier_hz=1575.42e6)
    assert not preds2[0].visible


def test_live_almanac_decode_and_warm_start(tmp_path):
    """OnlineNavigator._try_almanac: collects subframe 4/5 pages from a
    channel's accumulated prompt history (Ephemeris-thread role), emits
    the almanac_decoded event, and feeds SV_Select-style warm
    visibility back to the manager — almanac-known PRNs below the mask
    drop out of the acquisition want-list while unknown PRNs stay."""
    import io
    import json

    import tests.test_full_chain as tfc
    from gnsstpu.config import NavConfig, SignalConfig
    from gnsstpu.nav import geodesy, lnav
    from gnsstpu.nav.orbits import satpos
    from gnsstpu.nav.types import Ephemeris
    from gnsstpu.runtime.navigator import OnlineNavigator
    from gnsstpu.runtime.console import StatusBoard
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.signals.registry import get_signal

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    # Constellation candidates; 2 highest = "visible", 1 lowest = below
    # the mask from the receiver position.
    ephs = []
    for k in range(24):
        d = dict(tfc.BASE_EPH)
        d["M_0"] = (tfc.BASE_EPH["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (tfc.BASE_EPH["omega_0"] + 1.1 * k) \
            % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (k % 3)
        ephs.append(Ephemeris(**d))
    pos, _ = satpos(tfc.TOW0_6S * 6.0, ephs)
    _, el, _ = geodesy.topocent(tfc.RECV_ECEF, pos - tfc.RECV_ECEF)
    hi = list(np.argsort(-el)[:2])
    lo = int(np.argsort(el)[0])
    assert el[lo] < 0.0

    def to_alm(k):
        e = ephs[k]
        return Almanac(prn=k + 1, e=e.e, t_oa=tfc.TOW0_6S * 6.0,
                       delta_i=e.i_0 - 0.30 * np.pi,
                       omegaDot=e.omegaDot, health=0, sqrtA=e.sqrtA,
                       omega_0=e.omega_0, omega=e.omega, M_0=e.M_0,
                       a_f0=0.0, a_f1=0.0)

    pages = [alm_mod.almanac_page_words(to_alm(k)) for k in hi + [lo]]
    # Bit stream: subframes 1..5 twice, with the almanac pages cycling
    # through the 4/5 slots; prompt stream = bits at 20 ms/bit.
    syms = lnav.encode_frames(Ephemeris(**tfc.BASE_EPH),
                              tow0=tfc.TOW0_6S, n_subframes=10,
                              pages=pages)
    ip = np.repeat(syms, 20) * 800.0

    class SlotStub:
        prn = 7

    class MgrStub:
        slots = [SlotStub()]
        sd = get_signal("gps_l1ca")
        history = {7: {"i_p": [ip], "q_p": [], "carr_doppler": [],
                       "abs_sample": [], "start_ms": 0}}
        warm_visible = None
        warm_known = set()

    sink = io.StringIO()
    MgrStub.tlm = Telemetry(sink=sink)
    navr = OnlineNavigator(sig, NavConfig(elevation_mask_deg=10.0))
    # Pretend a fix exists so the visibility feedback runs.
    navr.solutions.append({"x": tfc.RECV_ECEF[0], "y": tfc.RECV_ECEF[1],
                           "z": tfc.RECV_ECEF[2]})
    navr.decoded[7] = (0, tfc.TOW0_6S * 6.0, None)
    mgr = MgrStub()
    navr._try_almanac(mgr, epoch_ms=30000)

    want_prns = sorted(p + 1 for p in hi + [lo])
    assert sorted(navr.almanac) == want_prns
    assert mgr.warm_known == set(want_prns)
    assert (lo + 1) not in mgr.warm_visible
    assert {h + 1 for h in hi} <= mgr.warm_visible

    # Event went out; the console 'alm' page renders it.
    evs = [json.loads(l) for l in sink.getvalue().splitlines()]
    alm_ev = [e for e in evs if e.get("what") == "almanac_decoded"]
    assert len(alm_ev) == 1 and sorted(alm_ev[0]["entries"]) == want_prns
    b = StatusBoard()
    for e in evs:
        b.update(e)
    page = b.render("alm")
    assert "entries" in page and str(lo + 1) in page

    # Manager want-list honors the warm mask (unknown PRNs unaffected).
    from gnsstpu.runtime.manager import ChannelManager
    want = ChannelManager._want_prns.__get__(
        type("M", (), {"pool": want_prns + [31],
                       "_tracked_prns": lambda self: set(),
                       "warm_visible": mgr.warm_visible,
                       "warm_known": mgr.warm_known})())
    got = want()
    assert (lo + 1) not in got and 31 in got
    for h in hi:
        assert (h + 1) in got


def test_assist_save_load_prefix_warm_start(tmp_path):
    """EEPROM role (gse gui_eeprom.cxx / gui_almanac.cpp dump/load):
    decoded almanac + iono/UTC persist to disk; a fresh navigator loads
    them with a rough position/time seed and produces warm-start
    visibility BEFORE any fix or decode — cold-sky search avoided
    across sessions."""
    from gnsstpu.config import NavConfig, SignalConfig
    from gnsstpu.nav import visibility
    from gnsstpu.nav.orbits import satpos
    from gnsstpu.runtime.navigator import OnlineNavigator
    from gnsstpu.signals.registry import get_signal

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    nav_a = OnlineNavigator(sig, NavConfig())
    alms = {p: make_almanac(p) for p in (3, 7, 11, 19)}
    nav_a.almanac = dict(alms)
    nav_a.iono_utc = make_ionoutc()
    path = tmp_path / "assist.json"
    nav_a.save_assist(str(path))

    # Seed receiver directly under SV 3 at its t_oa.
    eph3 = alms[3].to_ephemeris()
    t = alms[3].t_oa
    pos, _ = satpos(np.array([t]), [eph3])
    rx = pos[0] / np.linalg.norm(pos[0]) * 6371e3

    nav_b = OnlineNavigator(sig, NavConfig())
    nav_b.load_assist(str(path), seed_pos=rx, seed_t=t)
    assert sorted(nav_b.almanac) == sorted(alms)
    assert nav_b.iono_utc is not None
    assert nav_b.iono_utc.alpha0 == nav_a.iono_utc.alpha0
    for p in alms:
        for f in ("sqrtA", "e", "M_0", "omega_0", "delta_i"):
            assert getattr(nav_b.almanac[p], f) == getattr(alms[p], f)

    class _Tlm:
        def __init__(self):
            self.events = []

        def event(self, epoch_ms, what, **kw):
            self.events.append((what, kw))

    class _Mgr:
        slots = ()
        sd = get_signal("gps_l1ca")
        tlm = _Tlm()
        warm_visible = None
        warm_known: set = set()
        history: dict = {}

    mgr = _Mgr()
    nav_b._try_almanac(mgr, epoch_ms=0)
    # Pre-fix warm start ran: visibility published, sky view emitted.
    expect = {q.prn for q in visibility.predict(
        {p: a.to_ephemeris() for p, a in alms.items()}, t, rx,
        carrier_hz=1575.42e6, mask_deg=nav_b.nav.elevation_mask_deg)
        if q.visible}
    assert mgr.warm_visible == expect and 3 in mgr.warm_visible
    assert mgr.warm_known == set(alms)
    assert any(w == "sv_visibility" for w, _ in mgr.tlm.events)
