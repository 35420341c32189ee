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
