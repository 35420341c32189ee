"""Klobuchar ionospheric correction (nav.iono + pvt.navigate(iono=)).

The reference decodes the broadcast alpha/beta page but never applies
it (objects/ephemeris.cpp:314); the framework closes the loop. Tests:
the ICD-GPS-200 model's structural properties, and an end-to-end check
that the corrected solve removes a Klobuchar-consistent delay injected
into geometry-exact synthetic streams.
"""

import numpy as np

from gnsstpu.config import NavConfig, SignalConfig
from gnsstpu.nav import geodesy, pvt
from gnsstpu.nav.almanac import IonoUtc
from gnsstpu.nav.iono import klobuchar_delay
from gnsstpu.nav.orbits import satpos
from gnsstpu.nav.pvt import SPEED_OF_LIGHT
from gnsstpu.nav.types import Ephemeris
from gnsstpu.sim.scenario import signal_delay

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)

IU = IonoUtc(alpha0=1.1176e-8, alpha1=1.4901e-8, alpha2=-5.96e-8,
             alpha3=-5.96e-8, beta0=90112.0, beta1=16384.0,
             beta2=-98304.0, beta3=-65536.0)

BASE = dict(
    t_oc=266400.0, a_f0=0.0, a_f1=0.0, a_f2=0.0, T_GD=0.0,
    sqrtA=5153.712, e=0.0123456, M_0=1.23456, deltan=4.2e-9,
    omega=-1.87654, omega_0=-2.0312, omegaDot=-8.1e-9,
    i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
    C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
    C_ic=-7.45e-8, C_is=1.12e-7, valid=True,
)


def test_klobuchar_model_properties():
    """Night floor = 5 ns x slant; daytime peak tens of ns; low
    elevation inflates via the slant factor F."""
    # Night: local time far from 50400 s.
    d_night = klobuchar_delay(IU, 45.0, 10.0, np.array([180.0]),
                              np.array([90.0]), t_gps_s=7200.0)
    np.testing.assert_allclose(d_night, 5e-9, rtol=1e-3)
    # Day peak (t such that local time ~ 50400 at lon 0).
    d_day = klobuchar_delay(IU, 45.0, 0.0, np.array([180.0]),
                            np.array([90.0]), t_gps_s=50400.0)
    assert 1e-8 < float(d_day) < 1e-7
    # Slant: 5 deg elevation >> zenith.
    d_lo = klobuchar_delay(IU, 45.0, 0.0, np.array([180.0]),
                           np.array([5.0]), t_gps_s=50400.0)
    assert float(d_lo) > 2.0 * float(d_day)


def _visible_constellation(recv, tow0, n=5):
    cand = []
    for j in range(24):
        d = dict(BASE)
        d["M_0"] = (BASE["M_0"] + 2.1 * j) % (2 * np.pi) - np.pi
        d["omega_0"] = (BASE["omega_0"] + 1.1 * j) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (j % 3)
        cand.append(Ephemeris(**d))
    pos, _ = satpos(tow0, cand)
    _, el, _ = geodesy.topocent(recv, pos - recv)
    order = np.argsort(-el)[:n]
    prns = [int(j) + 1 for j in order]
    return prns, {int(j) + 1: cand[j] for j in order}


def test_iono_corrected_solve_beats_uncorrected():
    """Inject a Klobuchar-consistent delay into geometry-exact streams:
    navigate(iono=decoded_page) must recover most of the induced bias
    (the vertical component especially) vs the uncorrected solve."""
    recv = np.array([3427947.0, 603774.0, 5326967.0])
    # Daytime: tow mod 86400 near the 50400 s Klobuchar peak (266400
    # lands at 02:00 local — night floor, no signal for the test).
    tow0 = 266400.0 + 43200.0
    prns, ephs = _visible_constellation(recv, tow0)
    n_ms = 1100
    T = SIG.code_period_s
    fs = SIG.fs
    lat0, lon0, _ = geodesy.cart2geo(*recv, 5)
    sat_p, _ = satpos(tow0, [ephs[p] for p in prns])
    az, el, _ = geodesy.topocent(recv, sat_p - recv)
    d_iono = klobuchar_delay(IU, lat0, lon0, az, el, tow0)
    assert float(np.max(d_iono)) > 8e-9       # meaningful injection

    abs_clean = np.zeros((len(prns), n_ms))
    for i, p in enumerate(prns):
        for m in range(n_ms):
            t_tx = tow0 + m * T
            r = t_tx + 0.075
            for _ in range(4):
                r = t_tx + signal_delay(ephs[p], recv, r)
            abs_clean[i, m] = (r - tow0) * fs
    abs_delayed = abs_clean + (d_iono * fs)[:, None]

    nav_cfg = NavConfig(sol_period_ms=500, elevation_mask_deg=5.0,
                        use_tropo=False)

    def solve(iono):
        sol = pvt.navigate(
            abs_sample=abs_delayed, prns=prns,
            subframe_start_ms=[0] * len(prns), tow_s=tow0, ephs=ephs,
            sig=SIG, nav=nav_cfg, n_ms=n_ms, iono=iono)
        assert sol.valid.any()
        k = np.nonzero(sol.valid)[0][-1]
        pos = np.array([sol.x[k], sol.y[k], sol.z[k]])
        lat, lon, h = sol.latitude[k], sol.longitude[k], sol.height[k]
        return pos, h

    # Reference: the clean streams' solved height (absorbs the
    # relative-pseudorange convention's common-mode offset).
    sol0 = pvt.navigate(
        abs_sample=abs_clean, prns=prns,
        subframe_start_ms=[0] * len(prns), tow_s=tow0, ephs=ephs,
        sig=SIG, nav=nav_cfg, n_ms=n_ms)
    k0 = np.nonzero(sol0.valid)[0][-1]
    h_ref = sol0.height[k0]
    pos_ref = np.array([sol0.x[k0], sol0.y[k0], sol0.z[k0]])

    pos_u, h_u = solve(iono=None)
    pos_c, h_c = solve(iono=IU)
    err_u = np.linalg.norm(pos_u - pos_ref)
    err_c = np.linalg.norm(pos_c - pos_ref)
    assert err_c < 0.6 * err_u, (err_c, err_u)
    assert abs(h_c - h_ref) < 0.6 * abs(h_u - h_ref), (h_c - h_ref,
                                                       h_u - h_ref)
    # The uncorrected bias was meters-level, the corrected residual
    # sub-meter-ish (delays injected ARE the model's own).
    assert err_u > 1.0
    assert err_c < 1.0


def test_hatch_carrier_smoothing_reduces_scatter():
    """Carrier-smoothed pseudoranges (NavConfig.carrier_smoothing_s,
    classic Hatch filter fed by the integrated-carrier-phase stream):
    with noisy code observables and exact phase, the smoothed solve's
    position scatter drops well below the raw solve's."""
    rng = np.random.default_rng(7)
    recv = np.array([3427947.0, 603774.0, 5326967.0])
    tow0 = 266400.0
    prns, ephs = _visible_constellation(recv, tow0)
    n_ms = 6000
    T = SIG.code_period_s
    fs = SIG.fs
    f_carr = 1575.42e6
    from gnsstpu.sim.scenario import _fit_delay
    from gnsstpu.nav.orbits import satpos as satpos_fn

    abs_clean = np.zeros((len(prns), n_ms))
    carr_cycles = np.zeros((len(prns), n_ms))
    m_arr = np.arange(n_ms)
    for i, p in enumerate(prns):
        tau0, taud, taudd = _fit_delay(ephs[p], recv, tow0,
                                       n_ms * T, satpos_fn)
        t_tx = m_arr * T
        # receive time r = t_tx + tau(r); one fixed-point pass on the
        # smooth quadratic is plenty.
        tau = tau0 + taud * (t_tx + tau0) + taudd * (t_tx + tau0) ** 2
        tau = tau0 + taud * (t_tx + tau) + taudd * (t_tx + tau) ** 2
        abs_clean[i] = (t_tx + tau) * fs
        carr_cycles[i] = -f_carr * (tau - tau[0])
    # Code noise: sigma ~ 4 m on the code observable, phase exact.
    noise = rng.normal(0.0, 4.0 / (pvt.SPEED_OF_LIGHT / fs),
                       size=abs_clean.shape)
    abs_noisy = abs_clean + noise

    def scatter(smooth_s):
        nav_cfg = NavConfig(sol_period_ms=200, elevation_mask_deg=5.0,
                            use_tropo=False,
                            carrier_smoothing_s=smooth_s)
        sol = pvt.navigate(
            abs_sample=abs_noisy, prns=prns,
            subframe_start_ms=[0] * len(prns), tow_s=tow0, ephs=ephs,
            sig=SIG, nav=nav_cfg, n_ms=n_ms,
            carr_cycles=carr_cycles)
        v = sol.valid
        assert v.sum() >= 20
        xyz = np.stack([sol.x, sol.y, sol.z], 1)[v]
        # Scatter about the solution mean over the settled tail (the
        # filter converges over ~N epochs).
        tail = xyz[len(xyz) // 2:]
        return float(np.linalg.norm(tail - tail.mean(0), axis=1).mean())

    raw = scatter(0.0)
    smoothed = scatter(4.0)        # N = 20 epochs @ 200 ms
    assert raw > 2.0, raw          # noise actually present
    assert smoothed < 0.5 * raw, (smoothed, raw)
