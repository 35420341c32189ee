"""End-to-end GLONASS L1 FDMA position fix on simulated signals.

The reference's headline ("first open-source GLONASS software receiver",
wiki/GLONASS_SCILAB_RECEIVER.wiki) reproduced TPU-natively: a synthetic
6-SV FDMA constellation with geometry-true delays/Dopplers -> per-channel
FDMA acquisition -> fused/scan tracking -> time-mark + string decode
(bit-exact vs encoded truth) -> time-mark-anchored pseudoranges ->
satposg RK4 PZ-90 orbits -> LSQ. PASS = mean 3D error under 25 m.

Runs on CPU in a few minutes: python examples/e2e_glonass_fix.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", flush=True)


def main():
    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                SignalConfig, TrackConfig)
    from gnsstpu.runtime.receiver import run_receiver
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.sim import IFSimulator
    from gnsstpu.sim.scenario import (build_scenario_glonass,
                                      make_glonass_constellation)

    recv = np.array([3427947.0, 603774.0, 5326967.0])   # ECEF [m]
    tb = 675                                            # 11:15 Moscow day
    t0 = tb * 60 + 30.0
    n_ms = 10000

    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=4.096e6,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    gephs = make_glonass_constellation(recv, tb, n=6)
    sats, qephs = build_scenario_glonass(sig, gephs, recv, t0,
                                         duration_s=n_ms / 1000.0,
                                         cn0_dbhz=48.0, n_strings=4)
    log(f"scenario: {len(sats)} GLONASS SVs, freq channels "
        f"{sorted(p - 7 for p in qephs)}")
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=31)
    src = SimSource(sim, n_ms + 60)

    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=14e3, coherent_ms=2, threshold=2.5),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0,
                          aid_div=1602e6 / 0.511e6),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=6, ms_to_process=n_ms)
    out = run_receiver(src, cfg, n_ms=n_ms)
    log(f"acquired freq channels for PRNs {sorted(c.prn for c in out.channels)}")
    log(f"string ephemerides decoded: {sorted(out.ephs)}")

    assert out.nav is not None, "no navigation solution"
    v = out.nav.valid
    err = np.linalg.norm(np.stack([
        out.nav.x[v] - recv[0], out.nav.y[v] - recv[1],
        out.nav.z[v] - recv[2]]), axis=0)
    log(f"{v.sum()} valid epochs, mean 3D error {err.mean():.1f} m, "
        f"max {err.max():.1f} m")
    assert err.mean() < 25.0, "FAIL: mean 3D error too large"
    log("PASS: GLONASS FDMA position fix recovered")


if __name__ == "__main__":
    main()
