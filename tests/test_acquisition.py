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
