"""Closed-loop acquisition tests against the signal simulator.

Mirrors the reference's golden-data strategy (SURVEY.md §4): the simulator
fabricates signals with known code phase / Doppler, acquisition must find
them and reject absent PRNs.
"""

import numpy as np
import pytest

from gnsstpu.config import AcqConfig, SignalConfig
from gnsstpu.acquisition import acquire
from gnsstpu.sim import IFSimulator, SatParams

# Small, CPU-friendly config: complex baseband at 4 Msps, zero IF.
SIG = SignalConfig(if_freq=0.0, fs=4.096e6, complex_iq=True)
ACQ = AcqConfig(doppler_band=10e3, coherent_ms=2, threshold=2.5)


@pytest.fixture(scope="module")
def sim_signal():
    sats = [
        SatParams(prn=3, doppler_hz=1210.0, code_phase_chips=101.25,
                  cn0_dbhz=46.0),
        SatParams(prn=17, doppler_hz=-2800.0, code_phase_chips=517.5,
                  cn0_dbhz=44.0),
        SatParams(prn=29, doppler_hz=3900.0, code_phase_chips=1000.0,
                  cn0_dbhz=43.0),
    ]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=7)
    return sim, sim.generate(12)


def test_acquisition_finds_simulated_svs(sim_signal):
    sim, samples = sim_signal
    res = acquire(samples, SIG, ACQ)
    assert res.detected_prns() == [3, 17, 29]

    spc = SIG.samples_per_code
    samples_per_chip = SIG.fs / SIG.code_freq
    for s in sim.sats:
        i = s.prn - 1
        # Doppler within one bin (allow the adjacent bin when the truth
        # falls between two bins and noise tips the argmax).
        assert abs(res.carr_freq[i] - s.doppler_hz) <= \
            ACQ.doppler_bin_step() * 0.75 + 1e-6
        # Code phase: signal delayed by tau chips -> code starts at
        # tau*fs/fc samples (mod one code period).
        expect = (s.code_phase_chips * samples_per_chip) % spc
        err = (res.code_phase[i] - expect + spc / 2) % spc - spc / 2
        assert abs(err) <= 2.0, f"PRN {s.prn}: {res.code_phase[i]} vs {expect}"


def test_acquisition_rejects_noise_only():
    from gnsstpu.acquisition.search import acq_samples_needed

    rng = np.random.default_rng(0)
    n = acq_samples_needed(SIG, ACQ)
    noise = rng.standard_normal((n, 2)).astype(np.float32)
    res = acquire(noise, SIG, ACQ)
    assert res.detected_prns() == []


def test_weak_tier_noncoherent_gain():
    """Reference weak tier (10 ms coherent x K noncoherent sum,
    acquisition.cpp:433): a signal invisible to the strong 1 ms tier must
    be detected with noncoherent accumulation."""
    from gnsstpu.acquisition.search import acq_samples_needed

    sat = SatParams(prn=9, doppler_hz=525.0, code_phase_chips=300.25,
                    cn0_dbhz=27.0)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=13)

    base = AcqConfig(doppler_band=2e3, threshold=2.2, prn_list=(9,))
    strong = base.strong()
    weak = base.weak(noncoherent=12)
    samples = sim.generate(
        int(np.ceil(acq_samples_needed(SIG, weak) / (SIG.fs * 1e-3))) + 1)

    r_strong = acquire(samples[:acq_samples_needed(SIG, strong)], SIG,
                       strong)
    r_weak = acquire(samples, SIG, weak)
    assert 9 not in r_strong.detected_prns()
    assert 9 in r_weak.detected_prns()
    # Code phase still correct at 27 dB-Hz.
    spc = SIG.samples_per_code
    expect = (sat.code_phase_chips * SIG.fs / SIG.code_freq) % spc
    err = (r_weak.code_phase[8] - expect + spc / 2) % spc - spc / 2
    assert abs(err) <= 2.0


def test_beidou_nh_straddle_tiers():
    """COMPASS NH(20)-aware acquisition (acquisition_7x3ms.sci /
    acquisition_4x5ms.sci): with the D1 NH overlay flipping signs every
    code period, the 7x3 ms and 4x5 ms max-combined schemes must still
    acquire with full-strength metric."""
    from gnsstpu.acquisition.search import acq_samples_needed
    from gnsstpu.signals import beidou_b1
    from gnsstpu.signals.beidou_b1 import NH_CODE

    bsig = SignalConfig(signal="beidou_b1i", if_freq=0.0, fs=8.192e6,
                        code_freq=beidou_b1.CODE_FREQ,
                        code_length=beidou_b1.CODE_LENGTH)
    # D1 stream: data bits at 20 ms each, NH(20) chipping per code period.
    rng = np.random.default_rng(21)
    data = rng.choice([-1.0, 1.0], 40)
    overlay = (np.repeat(data, 20)
               * np.tile(NH_CODE.astype(np.float32), len(data)))
    sat = SatParams(prn=14, doppler_hz=-860.0, code_phase_chips=777.5,
                    cn0_dbhz=46.0, nav_bits=overlay)
    sim = IFSimulator(bsig, [sat], noise_sigma=1.0, seed=17)

    base = AcqConfig(doppler_band=3e3, threshold=2.2, prn_list=(14,))
    spc = bsig.samples_per_code
    expect = (sat.code_phase_chips * bsig.fs / bsig.code_freq) % spc
    for acq in (base.nh_7x3(), base.nh_4x5()):
        samples = sim.generate(
            int(np.ceil(acq_samples_needed(bsig, acq)
                        / (bsig.fs * 1e-3))) + 1)
        res = acquire(samples, bsig, acq)
        assert 14 in res.detected_prns(), acq
        err = (res.code_phase[13] - expect + spc / 2) % spc - spc / 2
        assert abs(err) <= 2.0, acq


def test_fine_doppler_refinement():
    """Squared-prompt fine-frequency stage (Channel::FrequencyLock
    equivalent): refine a coarse bin to within a few Hz, through data-bit
    flips."""
    from gnsstpu.acquisition.search import refine_doppler

    rng = np.random.default_rng(5)
    bits = rng.choice([-1.0, 1.0], 64)
    sat = SatParams(prn=22, doppler_hz=1843.0, code_phase_chips=0.0,
                    cn0_dbhz=45.0, nav_bits=bits)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=19)
    samples = sim.generate(14)
    # Coarse handoff off by 117 Hz (half a 250 Hz bin + change).
    fine = refine_doppler(samples, SIG, 22, 0, 1843.0 - 117.0, k_ms=12)
    assert abs(fine - 1843.0) < 5.0


def test_mm_fft_modes_match_stockham(sim_signal):
    """The MXU matmul-DFT acquisition path (fft_mode='mm'/'mm_bf16') must
    reproduce the exact Stockham path at the detection level: same peak
    cell for present PRNs, metrics within the bf16 spectrum error."""
    import jax.numpy as jnp

    from gnsstpu.acquisition.search import _stack_windows
    from gnsstpu.ops import fft_acquire

    sim, samples = sim_signal
    spc = SIG.samples_per_code
    blocks, _combine = _stack_windows(np.asarray(samples), spc, ACQ)
    fd_re, fd_im = fft_acquire.code_fd_table(
        SIG.signal, SIG.fs, SIG.code_freq, SIG.code_length,
        ACQ.coherent_ms)
    dopp = jnp.asarray(
        fft_acquire.doppler_grid(SIG.if_freq, ACQ.doppler_band,
                                 ACQ.doppler_bin_step()), jnp.float32)
    args = (jnp.asarray(blocks), jnp.asarray(fd_re), jnp.asarray(fd_im),
            dopp, SIG.fs, spc)
    spchip = int(round(SIG.fs / SIG.code_freq))

    def metrics(mode):
        cube = fft_acquire.acquire_cube(*args, fft_mode=mode)
        return fft_acquire.peak_metrics(cube, samples_per_code=spc,
                                        samples_per_chip=spchip)
    ref = metrics("stockham")
    for mode, rtol in (("mm", 1e-4), ("mm_bf16", 0.05)):
        got = metrics(mode)
        for s in sim.sats:
            i = s.prn - 1
            assert int(got["code_phase"][i]) == int(ref["code_phase"][i])
            assert int(got["doppler_bin"][i]) == int(ref["doppler_bin"][i])
            assert float(got["metric"][i]) == pytest.approx(
                float(ref["metric"][i]), rel=rtol)


def test_invalid_fft_mode_raises():
    """Typo'd fft_mode strings must raise, not silently pick a path."""
    from gnsstpu.ops.fftsc import resolve_fft_mode

    with pytest.raises(ValueError, match="fft_mode"):
        resolve_fft_mode("stockam")
    assert resolve_fft_mode("mm") == "mm"
    # Off-TPU (test backend is CPU) auto is always the exact path.
    assert resolve_fft_mode("auto") == "stockham"
