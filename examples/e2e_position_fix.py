"""End-to-end PVT demo: 6-satellite scenario -> full receiver -> 3D fix.

Simulates a geometry-consistent multi-SV GPS L1 IF stream (delays, Doppler
and nav data all derived from broadcast ephemerides + a receiver position),
then runs the complete receiver pipeline and prints the position error.

Run: python examples/e2e_position_fix.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get("GNSSTPU_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,  # noqa: E402
                            SignalConfig, TrackConfig)
from gnsstpu.nav import geodesy  # noqa: E402
from gnsstpu.nav.orbits import satpos  # noqa: E402
from gnsstpu.nav.types import Ephemeris  # noqa: E402
from gnsstpu.runtime.receiver import run_receiver  # noqa: E402
from gnsstpu.runtime.sources import SimSource  # noqa: E402
from gnsstpu.sim import IFSimulator  # noqa: E402
from gnsstpu.sim.scenario import build_scenario  # noqa: E402

BASE_EPH = dict(
    t_oc=266400.0, a_f0=2.45e-4, a_f1=-3.2e-12, a_f2=0.0, T_GD=-4.656e-9,
    sqrtA=5153.712, e=0.0123456, M_0=1.23456, deltan=4.2e-9,
    omega=-1.87654, omega_0=-2.0312, omegaDot=-8.1e-9,
    i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
    C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
    C_ic=-7.45e-8, C_is=1.12e-7, valid=True,
)
RECV_ECEF = np.array([3427947.0, 603774.0, 5326967.0])
TOW0_6S = 44400
N_MS = 24000

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
CFG = ReceiverConfig(
    signal=SIG,
    acq=AcqConfig(doppler_band=12e3, coherent_ms=2, threshold=2.5),
    track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0),
    nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                  use_tropo=False),
    n_channels=8, ms_to_process=N_MS,
)


def main():
    t0 = time.time()
    ephs = []
    for k in range(24):
        d = dict(BASE_EPH)
        d["M_0"] = (BASE_EPH["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (BASE_EPH["omega_0"] + 1.1 * k) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (k % 3)
        ephs.append(Ephemeris(**d))
    pos, _ = satpos(TOW0_6S * 6.0, ephs)
    _, el, _ = geodesy.topocent(RECV_ECEF, pos - RECV_ECEF)
    chosen = {int(k) + 1: ephs[k] for k in np.argsort(-el)[:6]}
    print(f"[{time.time()-t0:6.1f}s] scenario: PRNs {sorted(chosen)}, "
          f"elevations {np.round(np.sort(el)[::-1][:6], 1)} deg")

    sats = build_scenario(SIG, chosen, RECV_ECEF, TOW0_6S,
                          duration_s=N_MS / 1000.0, cn0_dbhz=47.0)
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=21)
    src = SimSource(sim, N_MS + 50)

    out = run_receiver(src, CFG, n_ms=N_MS)
    print(f"[{time.time()-t0:6.1f}s] receiver done: acquired "
          f"{[c.prn for c in out.channels]}, ephemerides for "
          f"{sorted(out.ephs)}")
    assert out.nav is not None
    v = out.nav.valid
    err3d = np.linalg.norm(np.stack([
        out.nav.x[v] - RECV_ECEF[0], out.nav.y[v] - RECV_ECEF[1],
        out.nav.z[v] - RECV_ECEF[2]]), axis=0)
    lat, lon, h = (np.mean(out.nav.latitude[v]), np.mean(out.nav.longitude[v]),
                   np.mean(out.nav.height[v]))
    print(f"[{time.time()-t0:6.1f}s] {v.sum()} epochs: "
          f"lat {lat:.6f} lon {lon:.6f} h {h:.1f} m | "
          f"3D err mean {np.mean(err3d):.1f} m max {np.max(err3d):.1f} m | "
          f"GDOP {np.mean(out.nav.dop[v, 0]):.1f}")
    assert np.mean(err3d) < 20.0
    print(f"[{time.time()-t0:6.1f}s] PASS: position fix within 20 m of truth")


if __name__ == "__main__":
    main()
