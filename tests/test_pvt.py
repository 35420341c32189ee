"""PVT layer tests: satpos sanity, LSQ recovery, geodesy round-trips.

Fixture-by-construction (SURVEY.md §4): pseudoranges synthesized from a
known receiver position + clock bias must be recovered by the solver.
"""

import numpy as np
import pytest

from gnsstpu.config import SPEED_OF_LIGHT
from gnsstpu.nav import geodesy, pvt
from gnsstpu.nav.orbits import OMEGA_E, satpos
from gnsstpu.nav.types import Ephemeris

# A plausible GPS ephemeris (quantization-friendly values).
BASE_EPH = dict(
    t_oc=266400.0, a_f0=2.45e-4, a_f1=-3.2e-12, a_f2=0.0, T_GD=-4.656e-9,
    sqrtA=5153.712, e=0.0123456, M_0=1.23456, deltan=4.2e-9,
    omega=-1.87654, omega_0=-2.0312, omegaDot=-8.1e-9,
    i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
    C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
    C_ic=-7.45e-8, C_is=1.12e-7, valid=True,
)


def make_constellation(n=6):
    """n satellites spread in mean anomaly / node for good geometry."""
    ephs = []
    for k in range(n):
        d = dict(BASE_EPH)
        d["M_0"] = (BASE_EPH["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (BASE_EPH["omega_0"] + 1.3 * k) % (2 * np.pi) - np.pi
        d["i_0"] = 0.96 + 0.01 * (k % 3)
        ephs.append(Ephemeris(**d))
    return ephs


def test_satpos_orbit_sanity():
    ephs = make_constellation(4)
    t = 266400.0
    pos, clk = satpos(t, ephs)
    r = np.linalg.norm(pos, axis=1)
    # GPS orbit radius ~26560 km; with e=0.012, +-330 km.
    assert np.all(np.abs(r - 26.56e6) < 0.4e6)
    # Orbital velocity ~3.9 km/s by numerical derivative.
    pos2, _ = satpos(t + 1.0, ephs)
    v = np.linalg.norm(pos2 - pos, axis=1)
    # ECEF speed = inertial (~3.87 km/s) minus frame rotation omega x r
    # (up to ~1.9 km/s at GPS radius): expect 2.0-4.5 km/s.
    assert np.all((v > 2000.0) & (v < 4500.0))
    # Clock correction near a_f0 - T_GD (small dt).
    assert np.all(np.abs(clk - (2.45e-4 + 4.656e-9)) < 1e-6)


def test_satpos_earth_rotation_consistency():
    # At t and t+dt, the inertial orbit advances but the ECEF frame also
    # rotates: Omega depends on tk through -OMEGA_E * tk. Check that a
    # whole orbital period later the ECEF longitude shifted by ~period*wE.
    ephs = make_constellation(1)
    a = BASE_EPH["sqrtA"] ** 2
    period = 2 * np.pi / np.sqrt(3.986005e14 / a ** 3)
    p0, _ = satpos(266400.0, ephs)
    p1, _ = satpos(266400.0 + period, ephs)
    lon0 = np.arctan2(p0[0, 1], p0[0, 0])
    lon1 = np.arctan2(p1[0, 1], p1[0, 0])
    dlon = (lon1 - lon0 + np.pi) % (2 * np.pi) - np.pi
    expect = -OMEGA_E * period  # westward drift of the ECEF trace (~ -pi!)
    # deltan and harmonic terms perturb this slightly; compare mod 2*pi
    # (GPS period is half a sidereal day, so the drift is essentially pi).
    err = (dlon - expect + np.pi) % (2 * np.pi) - np.pi
    assert abs(err) < 0.01


RECV_ECEF = np.array([3427947.0, 603774.0, 5326967.0])  # ~57N 10E (Jutland)
CLOCK_BIAS_M = 87123.4


def synth_obs(ephs, t, recv=RECV_ECEF, bias=CLOCK_BIAS_M, tropo=False):
    """Geometric pseudoranges incl. Sagnac: emulate signals received at
    time t whose ranges are measured in the receiver-time ECEF frame."""
    pos, clk = satpos(t, ephs)
    obs = np.empty(len(ephs))
    for i in range(len(ephs)):
        # Solve travel time fixed-point: rho(tau) with satellite rotated.
        tau = 0.07
        for _ in range(10):
            rot = geodesy.e_r_corr(np.array([tau]), pos[i:i + 1])[0]
            rho = np.linalg.norm(rot - recv)
            tau = rho / SPEED_OF_LIGHT
        obs[i] = rho + bias
        if tropo:
            _, el, _ = geodesy.topocent(recv, (rot - recv)[None])
            obs[i] += geodesy.tropo(np.sin(np.radians(el)))[0]
    return obs, pos, clk


def test_lsq_recovers_position_no_tropo():
    ephs = make_constellation(18)
    obs, sat_p, _ = synth_obs(ephs, 266400.0)
    # Drop sats below horizon at the receiver (geometry may include some).
    _, el, _ = geodesy.topocent(RECV_ECEF, sat_p - RECV_ECEF)
    keep = el > 5.0
    assert keep.sum() >= 5, "fixture geometry too poor"
    sol = pvt.least_square_pos(sat_p[keep], obs[keep], use_tropo=False)
    assert sol.ok
    err = np.linalg.norm(sol.pos[:3] - RECV_ECEF)
    assert err < 1e-3, f"position error {err} m"
    assert abs(sol.pos[3] - CLOCK_BIAS_M) < 1e-3
    assert np.all(np.abs(sol.residuals[np.nonzero(keep)[0] >= 0]) < 1e-3)
    assert sol.dop[0] > 0 and np.all(np.isfinite(sol.dop))


def test_lsq_with_tropo_model_consistency():
    ephs = make_constellation(18)
    obs, sat_p, _ = synth_obs(ephs, 266400.0, tropo=True)
    _, el, _ = geodesy.topocent(RECV_ECEF, sat_p - RECV_ECEF)
    keep = el > 5.0
    sol = pvt.least_square_pos(sat_p[keep], obs[keep], use_tropo=True)
    err = np.linalg.norm(sol.pos[:3] - RECV_ECEF)
    # Model self-consistency: obs built with the same tropo model.
    assert err < 0.01, f"position error {err} m"


def test_geodesy_roundtrips():
    lat, lon, h = geodesy.cart2geo(*RECV_ECEF, 5)
    assert 56.0 < lat < 58.0 and 9.0 < lon < 11.0
    lat2, lon2, h2 = geodesy.togeod(*RECV_ECEF)
    assert abs(lat - lat2) < 1e-7 and abs(lon - lon2) < 1e-9
    assert abs(h - h2) < 1e-3
    zone = geodesy.find_utm_zone(lat, lon)
    assert zone == 32
    e, n, u = geodesy.cart2utm(*RECV_ECEF, zone)
    # Lat ~57 N, lon ~10 E -> UTM32: E ~440-560 km, N ~6.3e6 m.
    assert 4.0e5 < e < 7.0e5 and 6.2e6 < n < 6.4e6
    assert abs(u - h) < 1e-3


def test_tropo_values():
    # Zenith delay ~2.3-2.5 m at sea level; grows toward horizon.
    z = geodesy.tropo(np.array([1.0]))[0]
    assert 2.0 < z < 2.8, z
    low = geodesy.tropo(np.array([np.sin(np.radians(5.0))]))[0]
    assert 15.0 < low < 30.0, low
    assert geodesy.tropo(np.array([0.0]))[0] > low


def test_pseudoranges_rebase():
    abs_sample = np.array([[163840.0, 180224.0], [170000.0, 186384.0]])
    ms = np.array([1, 1])
    pr = pvt.calculate_pseudoranges(abs_sample, ms, 16384.0, 68.802)
    # Channel 0 is earliest: travel 11.0 periods -> frac 0 + offset.
    assert pr[0] == pytest.approx(68.802 * SPEED_OF_LIGHT / 1000, rel=1e-12)
    d = (186384.0 - 180224.0) / 16384.0 * SPEED_OF_LIGHT / 1000
    assert pr[1] - pr[0] == pytest.approx(d, rel=1e-9)


def test_cross_correlation_screen():
    # ch2 aliases ch0's Doppler (+2 kHz offset) and is 20+ dB weaker
    cn0 = np.array([48.0, 45.0, 24.0, 26.0])
    dopp = np.array([1500.0, -2200.0, 3501.2, 777.0])
    sus = pvt.cross_correlation_suspects(cn0, dopp)
    assert list(sus) == [False, False, True, False]


def test_raim_rejects_faulted_pseudorange():
    ephs = make_constellation(7)
    t = 266400.0
    pos, clk = satpos(t, ephs)
    p_true = np.array([2849830.0, 2186822.0, 5252937.0])
    bias = 300.0
    obs = np.linalg.norm(
        geodesy.e_r_corr(np.linalg.norm(pos - p_true, axis=1)
                         / SPEED_OF_LIGHT, pos) - p_true, axis=1) + bias
    obs[2] += 800.0  # gross fault
    sol = pvt.least_square_pos_raim(pos, obs, use_tropo=False)
    assert sol.ok
    assert not sol.used[2] and sol.used.sum() == 6
    assert np.linalg.norm(sol.pos[:3] - p_true) < 2.0
    # plain LSQ on the same data is pulled off by the fault
    plain = pvt.least_square_pos(pos, obs, use_tropo=False)
    assert np.linalg.norm(plain.pos[:3] - p_true) > 50.0


def test_lsq_velocity_recovers_motion():
    """least_square_vel recovers receiver velocity + clock drift exactly
    from noise-free geometry-consistent Doppler."""
    rng = np.random.default_rng(3)
    rx = np.array([2.8e6, -4.5e6, 3.2e6])
    v_rx = np.array([30.0, -12.0, 5.0])
    ddt = 2.5  # clock drift [m/s]
    S = 7
    dirs = rng.normal(size=(S, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sat_pos = rx + dirs * 2.2e7
    sat_vel = rng.normal(scale=3000.0, size=(S, 3))
    lam = np.full(S, SPEED_OF_LIGHT / 1575.42e6)
    e = (sat_pos - rx) / np.linalg.norm(sat_pos - rx, axis=1, keepdims=True)
    rhodot = np.sum(e * (sat_vel - v_rx), axis=1) + ddt
    dop = -rhodot / lam
    sol = pvt.least_square_vel(sat_pos, sat_vel, rx, dop, lam)
    assert sol.ok
    np.testing.assert_allclose(sol.vel, v_rx, atol=1e-9)
    assert abs(sol.ddt - ddt) < 1e-9
    assert np.max(np.abs(sol.residuals)) < 1e-9


def test_lsq_velocity_underdetermined():
    sat_pos = np.array([[2.6e7, 0.0, 0.0], [0.0, 2.6e7, 0.0],
                        [0.0, 0.0, 2.6e7]])
    sol = pvt.least_square_vel(sat_pos, np.zeros((3, 3)), np.zeros(3),
                               np.zeros(3), np.full(3, 0.19))
    assert not sol.ok
