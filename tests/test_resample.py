"""IF resampler tests: rational polyphase + nearest-sample decimation.

Mirrors the reference's front-end conditioning (Resample_USRP_V1,
objects/gps_source.cpp:436,566-667: every source -> 2.048 Msps), checked
the way the reference's simd-test checks kernels — against a directly
computed reference.
"""

import numpy as np

from gnsstpu.ops.resample import (PolyphaseBank, ResampledSource,
                                  nearest_indices, polyphase_resample,
                                  rational_ratio)
from gnsstpu.runtime.sources import ArraySource


def tone(f, fs, n, phase0=0.0):
    t = np.arange(n) / fs
    z = np.exp(1j * (2 * np.pi * f * t + phase0))
    return np.stack([z.real, z.imag], -1).astype(np.float32)


def test_rational_ratio_gn3s():
    # GN3S 8.1838 Msps -> 2.048 Msps (gps_source.cpp:426): non-integer.
    p, q = rational_ratio(8.1838e6, 2.048e6)
    assert abs(p / q - 2.048 / 8.1838) < 1e-9


def test_polyphase_preserves_in_band_tone():
    fs_in, fs_out = 16.0e6, 2.048e6
    p, q = rational_ratio(fs_in, fs_out)
    f0 = 300e3
    x = tone(f0, fs_in, 40000)
    y = polyphase_resample(x, p, q)
    n_out = len(y)
    # compare against the ideal tone at the output rate, skipping edges
    ref = tone(f0, fs_out, n_out)
    s = slice(64, n_out - 64)
    zc = y[s, 0] + 1j * y[s, 1]
    zr = ref[s, 0] + 1j * ref[s, 1]
    corr = np.abs(np.vdot(zr, zc)) / (np.linalg.norm(zr)
                                      * np.linalg.norm(zc))
    assert corr > 0.999
    amp = np.mean(np.abs(zc))
    assert abs(amp - 1.0) < 0.02


def test_polyphase_time_alignment():
    # output sample n must align with input time n*q/p (integer group
    # delay by construction) — check phase of a resampled tone.
    fs_in, fs_out = 4.096e6, 2.048e6
    p, q = rational_ratio(fs_in, fs_out)
    f0 = 100e3
    x = tone(f0, fs_in, 8192, phase0=0.7)
    y = polyphase_resample(x, p, q)
    s = slice(32, len(y) - 32)
    ref = tone(f0, fs_out, len(y), phase0=0.7)
    zc = y[s, 0] + 1j * y[s, 1]
    zr = ref[s, 0] + 1j * ref[s, 1]
    dphi = np.angle(np.vdot(zr, zc))
    assert abs(dphi) < 0.01


def test_polyphase_rejects_alias():
    fs_in, fs_out = 16.0e6, 2.048e6
    p, q = rational_ratio(fs_in, fs_out)
    f_alias = 3.0e6  # above output Nyquist (1.024 MHz)
    x = tone(f_alias, fs_in, 40000)
    y = polyphase_resample(x, p, q)
    power = np.mean(np.sum(y[64:-64] ** 2, -1))
    assert power < 1e-4  # > 40 dB attenuation


def test_resampled_source_random_access_matches_full():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (30000, 2)).astype(np.float32)
    fs_in, fs_out = 8.1838e6, 2.048e6
    src = ResampledSource(ArraySource(x), fs_in, fs_out)
    full = src.read(0, len(src))
    for start, count in [(0, 100), (777, 333), (len(src) - 50, 50)]:
        np.testing.assert_allclose(src.read(start, count),
                                   full[start:start + count],
                                   rtol=0, atol=1e-5)


def test_nearest_matches_reference_lut():
    fs_in, fs_out = 8.1838e6, 2.048e6
    idx = nearest_indices(fs_in, fs_out, 0, 1000)
    naive = np.array([int(np.floor(n * fs_in / fs_out + 0.5))
                      for n in range(1000)])
    np.testing.assert_array_equal(idx, naive)
    x = np.arange(20000, dtype=np.float32).repeat(2).reshape(-1, 2)
    src = ResampledSource(ArraySource(x), fs_in, fs_out, mode="nearest")
    y = src.read(100, 50)
    np.testing.assert_array_equal(y[:, 0], idx[100:150].astype(np.float32))


def test_bank_dc_gain():
    bank = PolyphaseBank(4, 25)
    # zero-stuffed-by-p model: each phase row must sum to ~1
    sums = bank.bank.sum(0)
    np.testing.assert_allclose(sums, 1.0, atol=5e-3)


def test_acquisition_through_resampler():
    # simulate at a front-end rate, condition to 2.048 Msps, acquire
    from gnsstpu.acquisition import acquire
    from gnsstpu.acquisition.search import acq_samples_needed
    from gnsstpu.config import AcqConfig, SignalConfig
    from gnsstpu.sim import IFSimulator, SatParams

    fs_raw, fs = 8.192e6, 2.048e6
    sig_raw = SignalConfig(if_freq=0.0, fs=fs_raw, complex_iq=True)
    sig = SignalConfig(if_freq=0.0, fs=fs, complex_iq=True)
    sats = [SatParams(prn=7, doppler_hz=1800.0, code_phase_chips=444.25,
                      cn0_dbhz=48.0)]
    sim = IFSimulator(sig_raw, sats, noise_sigma=1.0, seed=3)
    acq = AcqConfig(coherent_ms=2, noncoherent=2)
    n_out = acq_samples_needed(sig, acq)
    n_ms = int(np.ceil(n_out * fs_raw / fs / sig_raw.samples_per_code)) + 2
    raw = np.asarray(sim.generate(n_ms))
    src = ResampledSource(ArraySource(raw), fs_raw, fs)
    res = acquire(src.read(0, n_out), sig, acq)
    assert bool(res.detected[6])
    spc = sig.samples_per_code
    expect_phase = (444.25 * fs / 1.023e6) % spc
    err = (float(res.code_phase[6]) - expect_phase + spc / 2) % spc - spc / 2
    assert abs(err) <= 2.0
    assert abs(float(res.carr_freq[6]) - 1800.0) < 300.0
