"""End-to-end GPS L1 C/A demo: simulate -> acquire -> track -> decode.

The full SURVEY.md §7 "minimum end-to-end slice", driven through the public
package surface. Fabricates an IF stream carrying real LNAV frames for one
SV (fixture-by-construction, like the reference's glonass_l3_generator.sce),
cold-acquires it, tracks it, bit/frame-syncs the prompt stream, and decodes
the broadcast ephemeris — which must match what was encoded, bit-exactly.

Run: python examples/e2e_gps_l1.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# Demo runs on the host CPU backend unless explicitly pointed at hardware
# (the sitecustomize-exported JAX_PLATFORMS wins over plain env vars, so we
# must set the platform through jax.config before first backend use).
if os.environ.get("GNSSTPU_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from gnsstpu.acquisition import acquire  # noqa: E402
from gnsstpu.config import AcqConfig, SignalConfig, TrackConfig
from gnsstpu.nav import Ephemeris, frame, lnav
from gnsstpu.runtime.sources import SimSource
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import ChannelInit, track

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
ACQ = AcqConfig(doppler_band=10e3, coherent_ms=2, threshold=2.5)
TRK = TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0)

EPH = Ephemeris(
    week=202, accuracy=1, health=0, T_GD=-4.656e-9, IODC=311,
    t_oc=266400.0, a_f2=0.0, a_f1=-3.2e-12, a_f0=2.45e-4,
    IODE_sf2=55, C_rs=-12.8125, deltan=4.2e-9, M_0=1.23456,
    C_uc=-6.7e-7, e=0.0123456, C_us=8.1e-6, sqrtA=5153.712,
    t_oe=266400.0, C_ic=-7.45e-8, omega_0=-2.0312, C_is=1.12e-7,
    i_0=0.96123, C_rc=221.5625, omega=-1.87654, omegaDot=-8.1e-9,
    IODE_sf3=55, iDot=4.0e-10,
)
TOW0 = 44400        # truncated TOW (6 s units) of first encoded subframe


def main():
    t0 = time.time()
    # 2 s of filler bits (covers the tracking pull-in transient), then five
    # real LNAV subframes. The last two filler bits are 0 (+1) because the
    # encoder parity chain starts at D29*=D30*=0.
    rng = np.random.default_rng(5)
    filler = rng.choice([-1.0, 1.0], size=100)
    filler[-2:] = 1.0
    nav = np.concatenate([filler, lnav.encode_frames(EPH, tow0=TOW0)])
    n_ms = 21000

    sat = SatParams(prn=7, doppler_hz=1836.0, code_phase_chips=412.4,
                    cn0_dbhz=45.0, nav_bits=nav)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=13)
    src = SimSource(sim, n_ms + 50)
    print(f"[{time.time()-t0:6.1f}s] simulator ready "
          f"({n_ms} ms @ {SIG.fs/1e6:.3f} Msps, C/N0 {sat.cn0_dbhz} dB-Hz)")

    from gnsstpu.acquisition.search import acq_samples_needed
    res = acquire(src.read(0, acq_samples_needed(SIG, ACQ)), SIG, ACQ)
    print(f"[{time.time()-t0:6.1f}s] acquisition: detected PRNs "
          f"{res.detected_prns()}, metric "
          f"{res.peak_metric[sat.prn-1]:.1f}, doppler "
          f"{res.carr_freq[sat.prn-1]:+.0f} Hz, code phase "
          f"{res.code_phase[sat.prn-1]} samples")
    assert res.detected_prns() == [sat.prn], "acquisition failed"

    ch = ChannelInit(prn=sat.prn,
                     code_phase=int(res.code_phase[sat.prn - 1]),
                     doppler_hz=float(res.carr_freq[sat.prn - 1]))
    tr = track(src, [ch], SIG, TRK, n_ms, chunk_ms=250)
    cn0_proxy = 10 * np.log10(
        np.mean(tr.i_p[0, 2000:] ** 2)
        / max(np.var(tr.q_p[0, 2000:]), 1e-9) * 1000.0)
    print(f"[{time.time()-t0:6.1f}s] tracking done: mean doppler "
          f"{np.mean(tr.carr_freq[0, 2000:]):+.1f} Hz "
          f"(truth {sat.doppler_hz:+.1f}), C/N0 proxy {cn0_proxy:.1f} dB-Hz")

    sync = frame.find_preamble(tr.i_p[0])
    assert sync.found, "no preamble found"
    print(f"[{time.time()-t0:6.1f}s] frame sync: first subframe at "
          f"{sync.first_subframe_ms} ms, polarity {sync.polarity:+d}")

    bits = frame.bits_from(tr.i_p[0], sync)
    dec, tow = lnav.decode_subframes(bits, d30_star=sync.d30_star)
    assert dec.valid, "ephemeris decode failed (parity)"
    print(f"[{time.time()-t0:6.1f}s] ephemeris decoded: TOW {tow} s, "
          f"week {dec.week}, sqrtA {dec.sqrtA:.3f}, e {dec.e:.7f}")

    # Bit-exact round-trip check against the encoded quantization.
    assert dec.week == EPH.week and dec.IODC == EPH.IODC
    for f, lsb in (("sqrtA", 2.0 ** -19), ("e", 2.0 ** -33),
                   ("M_0", 2.0 ** -31 * np.pi),
                   ("omega_0", 2.0 ** -31 * np.pi),
                   ("i_0", 2.0 ** -31 * np.pi)):
        want = round(getattr(EPH, f) / lsb) * lsb
        got = getattr(dec, f)
        assert abs(got - want) < 1e-12 * max(1.0, abs(want)), f
    assert tow == TOW0 * 6
    print(f"[{time.time()-t0:6.1f}s] PASS: decoded ephemeris is bit-exact "
          f"vs encoded truth")


if __name__ == "__main__":
    main()
