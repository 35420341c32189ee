"""BeiDou B1I tests: code properties, BCH, D1 codec, closed loop.

Golden-data strategy mirrors the reference COMPASS/B1 receiver.
"""

import numpy as np
import pytest

from gnsstpu.config import AcqConfig, SignalConfig, TrackConfig
from gnsstpu.acquisition import acquire
from gnsstpu.acquisition.search import acq_samples_needed
from gnsstpu.nav import beidou as bd
from gnsstpu.runtime.sources import SimSource
from gnsstpu.signals.beidou_b1 import NH_CODE, generate_b1i_code
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import ChannelInit, track

SIG = SignalConfig(signal="beidou_b1i", if_freq=0.0, fs=8.184e6,
                   code_freq=2.046e6, code_length=2046)


def test_b1i_code_properties():
    c = generate_b1i_code(1)
    assert c.shape == (2046,) and set(np.unique(c)) == {-1, 1}
    # Balance within 2 and low cross-correlation between PRNs.
    assert abs(int(c.sum())) <= 2
    for prn in (2, 7, 19, 37):
        c2 = generate_b1i_code(prn)
        xc = np.abs(np.fft.ifft(np.fft.fft(c.astype(float))
                                * np.conj(np.fft.fft(c2.astype(float)))))
        assert xc.max() < 0.2 * 2046, f"PRN 1 x {prn}"
    # Distinct codes per PRN.
    assert not np.array_equal(generate_b1i_code(3), generate_b1i_code(4))


def test_bch15():
    rng = np.random.default_rng(0)
    for _ in range(30):
        info = rng.integers(0, 2, 11).astype(np.int8)
        par = bd.bch15_parity(info)
        word = np.concatenate([info, par])
        ok, dec = bd.bch15_check(word)
        assert ok and np.array_equal(dec, info)
        # Any single-bit error is corrected.
        k = rng.integers(0, 15)
        bad = word.copy()
        bad[k] ^= 1
        ok, dec = bd.bch15_check(bad)
        assert ok and np.array_equal(dec, info)


def make_bdeph():
    return bd.BeiDouEphemeris(
        SatH1=0, IODC=17, URAI=2, WN=810, t_oc=123000.0, T_GD_1=-2.5e-9,
        alpha0=1.2e-8, alpha1=-7.45e-9, alpha2=5.96e-8, alpha3=-1.19e-7,
        beta0=110592.0, beta1=-32768.0, beta2=131072.0, beta3=-196608.0,
        a0=-4.37e-4, a1=3.18e-12, a2=0.0, IODE=9,
        deltan=4.19e-9, C_uc=-5.82e-6, M_0=0.76543, e=0.00512345,
        C_us=7.23e-6, C_rc=187.3125, C_rs=-98.90625, sqrtA=5282.619,
        t_oe=123000.0, i_0=0.98765, C_ic=-4.66e-8, omegaDot=-6.8e-9,
        C_is=9.31e-8, iDot=2.9e-10, omega_0=1.40625, omega=-2.53125,
        valid=True,
    )


def test_d1_codec_roundtrip():
    eph = make_bdeph()
    sow0 = 123000 - 30
    sym = bd.encode_symbols(eph, sow0, n_subframes=5)
    assert len(sym) == 5 * 6000
    prompt = sym * 700.0
    start, pol = bd.find_subframe(prompt)
    assert start == 0 and pol != 0
    dec, t = bd.decode_subframes(prompt, 0, n_subframes=5)
    assert dec.valid
    assert t == sow0
    assert (dec.WN, dec.IODC, dec.IODE, dec.URAI) == (810, 17, 9, 2)
    scales = {
        "t_oc": 8.0, "T_GD_1": 0.1e-9, "a0": 2.0 ** -33, "a1": 2.0 ** -50,
        "deltan": 2.0 ** -43 * bd.BD_PI, "C_uc": 2.0 ** -31,
        "M_0": 2.0 ** -31 * bd.BD_PI, "e": 2.0 ** -33,
        "C_us": 2.0 ** -31, "C_rc": 2.0 ** -6, "C_rs": 2.0 ** -6,
        "sqrtA": 2.0 ** -19, "i_0": 2.0 ** -31 * bd.BD_PI,
        "C_ic": 2.0 ** -31, "omegaDot": 2.0 ** -43 * bd.BD_PI,
        "C_is": 2.0 ** -31, "iDot": 2.0 ** -43 * bd.BD_PI,
        "omega_0": 2.0 ** -31 * bd.BD_PI,
        "omega": 2.0 ** -31 * bd.BD_PI, "t_oe": 8.0,
        "alpha0": 2.0 ** -30, "beta0": 2.0 ** 11,
    }
    for f, lsb in scales.items():
        want = round(getattr(eph, f) / lsb) * lsb
        assert getattr(dec, f) == pytest.approx(want, rel=1e-12,
                                                abs=1e-30), f


def test_d1_single_bit_error_corrected():
    eph = make_bdeph()
    sym = bd.encode_symbols(eph, 1000, n_subframes=3)
    # Corrupt one full data bit (20 symbols) inside word 5 of subframe 2.
    bad = sym.copy()
    bit = 6000 // 20 + 150
    bad[bit * 20:(bit + 1) * 20] *= -1
    dec, t = bd.decode_subframes(bad * 500.0, 0, n_subframes=3)
    assert dec.valid, "BCH correction failed"
    lsb = 2.0 ** -19
    assert dec.sqrtA == pytest.approx(round(eph.sqrtA / lsb) * lsb)


def test_b1i_closed_loop():
    eph = make_bdeph()
    rng = np.random.default_rng(6)
    filler = rng.choice([-1.0, 1.0], 2000)      # 2 s of random symbols
    sym = np.concatenate([filler, bd.encode_symbols(eph, 7000,
                                                    n_subframes=4)])
    sat = SatParams(prn=14, doppler_hz=-1650.0, code_phase_chips=804.6,
                    cn0_dbhz=48.0, nav_bits=sym)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=12)
    n_ms = 21000                                 # 2 s filler + 3 subframes+
    src = SimSource(sim, n_ms + 50)
    # NH(20) flips the symbol sign between consecutive code periods, so
    # the 4-quadrant FLL cross-product discriminator is corrupted (cross
    # changes sign on a flip). Use the 2-quadrant decision-directed
    # discriminator (fll_disc="atan"), which is flip-invariant, for
    # pull-in of the residual acquisition Doppler error.
    acq = AcqConfig(doppler_band=8e3, coherent_ms=1, threshold=2.0,
                    doppler_step=125.0)
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    assert sat.prn in res.detected_prns()
    ch = ChannelInit(prn=sat.prn, code_phase=int(res.code_phase[sat.prn - 1]),
                     doppler_hz=float(res.carr_freq[sat.prn - 1]))
    trk = TrackConfig(dll_bw=1.5, pll_bw=25.0, fll_bw=150.0,
                      fll_disc="atan", aid_div=1561.098e6 / 2.046e6)
    tr = track(src, [ch], SIG, trk, n_ms, chunk_ms=250)
    assert abs(np.mean(tr.carr_freq[0, 3000:]) - sat.doppler_hz) < 3.0
    start, pol = bd.find_subframe(tr.i_p[0, 1000:])
    assert start >= 0
    dec, t = bd.decode_subframes(tr.i_p[0, 1000:], start, n_subframes=3)
    assert dec.valid
    assert t == 7000 + (1000 + start - 2000) // 6000 * 6
    lsb = 2.0 ** -19
    assert dec.sqrtA == pytest.approx(round(eph.sqrtA / lsb) * lsb)


# ---------------------------------------------------------------------------
# BeiDou B1I D1 position fix (COMPASS/B1 postNavigation analogue):
# NH-wiped subframe sync -> SOW pseudoranges -> CGCS2000 Kepler -> LSQ.
# ---------------------------------------------------------------------------

BD_RECV = np.array([3427947.0, 603774.0, 5326967.0])
BD_SOW0 = 123000            # = t_oe (subframe grid: multiple of 6 s)
BD_NMS = 20600


def make_bd_constellation(n=5):
    """Synthetic CGCS2000 constellation; n highest-elevation MEO SVs."""
    from gnsstpu.nav import geodesy

    base = make_bdeph()
    ephs = []
    for k in range(30):
        e = bd.BeiDouEphemeris(**{**base.__dict__})
        e.M_0 = (base.M_0 + 2.3 * k) % (2 * np.pi) - np.pi
        e.omega_0 = (base.omega_0 + 1.3 * k) % (2 * np.pi) - np.pi
        e.i_0 = 0.93 + 0.04 * (k % 3)
        ephs.append(e)
    pos, _ = bd.satpos_bd(float(BD_SOW0), ephs)
    _, el, _ = geodesy.topocent(BD_RECV, pos - BD_RECV)
    order = np.argsort(-el)[:n]
    assert el[order[-1]] > 15.0
    return {int(k) + 1: ephs[k] for k in order}


@pytest.fixture(scope="module")
def beidou_fix_output():
    from gnsstpu.config import NavConfig, ReceiverConfig
    from gnsstpu.runtime.receiver import run_receiver
    from gnsstpu.sim.scenario import build_scenario_beidou

    sig = SignalConfig(signal="beidou_b1i", if_freq=0.0, fs=4.096e6,
                       code_freq=2.046e6, code_length=2046,
                       complex_iq=True)
    ephs = make_bd_constellation(5)
    sats, qephs = build_scenario_beidou(
        sig, ephs, BD_RECV, BD_SOW0, duration_s=BD_NMS / 1000.0,
        cn0_dbhz=48.0, n_subframes=4)
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=17)
    src = SimSource(sim, BD_NMS + 60)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=12e3, coherent_ms=1, threshold=2.0,
                      doppler_step=125.0),
        track=TrackConfig(dll_bw=1.5, pll_bw=25.0, fll_bw=150.0,
                          fll_disc="atan",
                          aid_div=1561.098e6 / 2.046e6),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=6, ms_to_process=BD_NMS)
    return qephs, run_receiver(src, cfg, n_ms=BD_NMS)


def test_beidou_d1_decoded_bit_exact(beidou_fix_output):
    qephs, out = beidou_fix_output
    assert sorted(out.ephs) == sorted(qephs)
    for prn, dec in out.ephs.items():
        truth = qephs[prn]
        for f in ("sqrtA", "e", "M_0", "omega_0", "i_0", "t_oe", "a0",
                  "a1", "deltan", "omega"):
            assert getattr(dec, f) == getattr(truth, f), (prn, f)


def test_beidou_position_fix(beidou_fix_output):
    qephs, out = beidou_fix_output
    assert out.nav is not None, "no BeiDou navigation solution"
    valid = out.nav.valid
    assert valid.sum() >= 10, f"only {valid.sum()} valid epochs"
    err3d = np.linalg.norm(np.stack(
        [out.nav.x[valid] - BD_RECV[0], out.nav.y[valid] - BD_RECV[1],
         out.nav.z[valid] - BD_RECV[2]]), axis=0)
    assert np.mean(err3d) < 25.0, f"mean 3D error {np.mean(err3d):.1f} m"
    assert np.max(err3d) < 80.0, f"max 3D error {np.max(err3d):.1f} m"
