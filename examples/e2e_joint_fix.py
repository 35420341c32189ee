"""Joint GPS + GLONASS position fix from 3 + 3 satellites.

A capability beyond the reference ecosystem (which ships four separate
single-constellation receivers): two 3-SV runs — below each system's
4-satellite minimum, so NEITHER can fix alone — are fused in one LSQ
with an estimated GPS-GLONASS inter-system clock state
(gnsstpu.nav.pvt.navigate_joint). Both streams share one nominal sample
clock, as a dual-band front end's channels would.

PASS = each subsystem alone produces no solution, the joint solve fixes
with mean 3D error under 30 m and a stable inter-system bias.

Runs on CPU in a few minutes: python examples/e2e_joint_fix.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

T0 = time.time()
RECV = np.array([3427947.0, 603774.0, 5326967.0])
N_MS = 24000
FS = 4.096e6


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", flush=True)


def run_gps():
    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                SignalConfig, TrackConfig)
    from gnsstpu.nav import geodesy
    from gnsstpu.nav.orbits import satpos
    from gnsstpu.nav.types import Ephemeris
    from gnsstpu.runtime.receiver import run_receiver
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.sim import IFSimulator
    from gnsstpu.sim.scenario import build_scenario

    # 3 highest SVs of a synthetic constellation around t_oe.
    base = dict(
        t_oc=266400.0, a_f0=2.45e-4, a_f1=-3.2e-12, a_f2=0.0,
        T_GD=-4.656e-9, sqrtA=5153.712, e=0.0123456, M_0=1.23456,
        deltan=4.2e-9, omega=-1.87654, omega_0=-2.0312,
        omegaDot=-8.1e-9, i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
        C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
        C_ic=-7.45e-8, C_is=1.12e-7, valid=True)
    cand = []
    for k in range(24):
        d = dict(base)
        d["M_0"] = (base["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (base["omega_0"] + 1.1 * k) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (k % 3)
        cand.append(Ephemeris(**d))
    pos, _ = satpos(266400.0, cand)
    _, el, _ = geodesy.topocent(RECV, pos - RECV)
    pick = np.argsort(-el)[:3]
    ephs = {int(k) + 1: cand[k] for k in pick}

    sig = SignalConfig(if_freq=0.0, fs=FS, complex_iq=True)
    sats = build_scenario(sig, ephs, RECV, 44400,
                          duration_s=N_MS / 1000.0, cn0_dbhz=47.0)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=21)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=10e3, coherent_ms=2, threshold=2.4,
                      prn_list=tuple(ephs), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=3)
    out = run_receiver(SimSource(sim, N_MS + 50), cfg, n_ms=N_MS)
    log(f"GPS: decoded {sorted(out.ephs)}; single-system nav: "
        f"{'NONE (3 SVs < 4)' if out.nav is None else 'unexpected!'}")
    return sig, out


def run_glonass():
    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                SignalConfig, TrackConfig)
    from gnsstpu.runtime.receiver import run_receiver
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.sim import IFSimulator
    from gnsstpu.sim.scenario import (build_scenario_glonass,
                                      make_glonass_constellation)

    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=FS,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    tb = 675
    gephs = make_glonass_constellation(RECV, tb, n=3)
    sats, qephs = build_scenario_glonass(
        sig, gephs, RECV, tb * 60 + 30.0, duration_s=N_MS / 1000.0,
        cn0_dbhz=48.0, n_strings=8)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=31)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=14e3, coherent_ms=2, threshold=2.5,
                      prn_list=tuple(qephs), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0,
                          aid_div=1602e6 / 0.511e6),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=3)
    out = run_receiver(SimSource(sim, N_MS + 60), cfg, n_ms=N_MS)
    log(f"GLONASS: decoded {sorted(out.ephs)}; single-system nav: "
        f"{'NONE (3 SVs < 4)' if out.nav is None else 'unexpected!'}")
    return sig, out


def system_obs(out, sig, satpos_fn):
    from gnsstpu.nav import pvt

    good = [c for c, ch in enumerate(out.channels)
            if ch.prn in out.ephs and out.anchors[c].found]
    period = sig.code_period_s
    t0 = max(out.anchors[c].t_anchor for c in good)
    sf = [out.anchors[c].anchor_idx
          + int(round((t0 - out.anchors[c].t_anchor) / period))
          for c in good]
    return pvt.SystemObs(
        prns=[out.channels[c].prn for c in good],
        abs_sample=out.track.abs_sample[good],
        subframe_start=sf, tow_s=t0, ephs=out.ephs,
        satpos_fn=satpos_fn, code_period_s=period, fs=sig.fs)


def main():
    from gnsstpu.config import NavConfig
    from gnsstpu.nav import glonass as gl
    from gnsstpu.nav import pvt
    from gnsstpu.nav.orbits import satpos

    log("running 3-SV GPS receiver...")
    sig_g, out_g = run_gps()
    log("running 3-SV GLONASS receiver...")
    sig_r, out_r = run_glonass()
    assert out_g.nav is None and out_r.nav is None

    log("joint solve: 3 GPS + 3 GLONASS pseudoranges, 5 states + "
        "inter-system clock...")
    sol = pvt.navigate_joint(
        [system_obs(out_g, sig_g, satpos),
         system_obs(out_r, sig_r, gl.satpos_gl)],
        NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                  use_tropo=False), n_epochs=10)
    v = sol.valid
    err = np.linalg.norm(np.stack(
        [sol.x[v] - RECV[0], sol.y[v] - RECV[1], sol.z[v] - RECV[2]]),
        axis=0)
    inter = sol.inter_sys[v, 0]
    log(f"joint fix: {int(v.sum())}/10 epochs, mean 3D error "
        f"{err.mean():.1f} m, GPS-GLONASS bias {inter.mean() / 299792458.0 * 1e3:.3f} ms "
        f"(std {np.std(inter):.1f} m)")
    assert v.sum() >= 8 and err.mean() < 30.0 and np.std(inter) < 15.0
    log("PASS: joint GPS+GLONASS fix from subsets neither system could "
        "solve alone")


if __name__ == "__main__":
    main()
