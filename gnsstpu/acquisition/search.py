"""Cold-start acquisition: FFT code-phase x Doppler search over all PRNs.

Host-facing wrapper around gnsstpu.ops.fft_acquire, reproducing the
reference's detection logic (GPS/L1/acquisition.sci:45-192): two alternating
coherent windows, peak / second-peak ratio against a threshold, and the
(code phase [samples], carrier frequency [Hz]) handoff to tracking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gnsstpu.config import AcqConfig, SignalConfig
from gnsstpu.ops import fft_acquire
from gnsstpu.signals.registry import get_signal


@dataclasses.dataclass
class AcqResults:
    """Per-PRN acquisition outcome (index 0 = PRN 1)."""

    peak_metric: np.ndarray   # [P] peak/second-peak ratio
    code_phase: np.ndarray    # [P] samples (0-based offset of code start)
    carr_freq: np.ndarray     # [P] acquired carrier frequency [Hz]
    detected: np.ndarray      # [P] bool

    def detected_prns(self) -> list:
        return [int(p) + 1 for p in np.nonzero(self.detected)[0]]


def _windows_of(acq: AcqConfig) -> tuple:
    """(n_windows, combine) from the tier config.

    noncoherent > 1 -> sum-combined noncoherent accumulation (the
    reference's weak tier, acquisition.cpp:433); otherwise max-combined
    windows: 2 = alternating bit-flip dodge (acquisition.sci:126-132),
    7/4 with coherent_ms=3/5 = the COMPASS NH-straddling schemes.
    """
    if acq.noncoherent > 1:
        return acq.noncoherent, "sum"
    return (acq.n_windows or 2), "max"


def acq_samples_needed(sig: SignalConfig, acq: AcqConfig) -> int:
    """Leading samples acquire() consumes (B coherent windows + tail)."""
    spc = sig.samples_per_code
    B, _ = _windows_of(acq)
    base = (B - 1) * acq.coherent_ms * spc + fft_acquire.window_len(
        spc, acq.coherent_ms)
    return max(base, (acq.fine_doppler_ms + 1) * spc)


def refine_doppler(samples_iq: np.ndarray, sig: SignalConfig, prn: int,
                   code_phase: int, coarse_carr_hz: float,
                   k_ms: int = 10, iters: int = 2) -> float:
    """Fine carrier frequency from squared prompt accumulations.

    The TPU-framework form of the reference's FFT frequency lock
    (Channel::FrequencyLock, objects/channel.cpp:359-417, which operates
    on squared 1 kHz correlator outputs): wipe the code and the coarse
    carrier off k_ms code periods at the acquired code phase, integrate
    each period into a prompt p_k (lifting per-sample SNR by ~spc), square
    to strip any BPSK data/overlay flips, and estimate the residual from
    the mean phase advance  delta = angle(sum p_k^2 conj(p_{k-1}^2)) /
    (4*pi*T).  Unambiguous over +-1/(4T) (+-250 Hz at 1 ms codes) —
    always >= the coarse grid's half-bin error. Two iterations re-wipe
    with the first estimate to kill the phase-ramp decorrelation across
    the prompt.  Host-side NumPy — a few thousand samples.

    Returns the refined absolute carrier frequency [Hz].
    """
    from gnsstpu.ops import code_tables

    spc = sig.samples_per_code
    n = k_ms * spc
    x = samples_iq[code_phase: code_phase + n]
    if x.shape[0] < n:
        raise ValueError("not enough samples for fine Doppler")
    table = code_tables.sampled_code_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length)
    code = np.tile(table[prn - 1].astype(np.float64), k_ms)
    xc = (x[:, 0].astype(np.float64) + 1j * x[:, 1]) * code
    t = np.arange(n, dtype=np.float64) / sig.fs
    T = spc / sig.fs
    carr = coarse_carr_hz
    for _ in range(iters):
        w = xc * np.exp(-2j * np.pi * carr * t)
        p = w.reshape(k_ms, spc).sum(axis=1)
        q = p * p
        acc = np.sum(q[1:] * np.conj(q[:-1]))
        carr += float(np.angle(acc)) / (4.0 * np.pi * T)
    return carr


def _stack_windows(samples_iq: np.ndarray, spc: int, acq: AcqConfig):
    """[B, Lw, 2] coherent windows at stride coherent_ms code periods."""
    B, combine = _windows_of(acq)
    L = acq.coherent_ms * spc
    Lw = fft_acquire.window_len(spc, acq.coherent_ms)
    need = (B - 1) * L + Lw
    if samples_iq.shape[0] < need:
        raise ValueError(f"need >= {need} samples for {B} x "
                         f"{acq.coherent_ms} ms coherent windows")
    blocks = np.stack([samples_iq[k * L: k * L + Lw] for k in range(B)])
    return jnp.asarray(blocks, jnp.float32), combine


def acquire(samples_iq: np.ndarray, sig: SignalConfig, acq: AcqConfig,
            sharding: Optional[object] = None) -> AcqResults:
    """Search all PRNs of sig.signal in the leading samples.

    Args:
      samples_iq: f32 [N >= acq_samples_needed(sig, acq), 2].
      sharding: optional jax sharding for the Doppler axis (multi-chip).
    """
    sd = get_signal(sig.signal)
    spc = sig.samples_per_code
    # B coherent windows at stride coherent_ms, each with one extra code
    # period of tail for linear-correlation lags; max-combined (bit/NH
    # dodge) or sum-combined (noncoherent weak tier).
    blocks, combine = _stack_windows(samples_iq, spc, acq)

    fd_re, fd_im = fft_acquire.code_fd_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length, acq.coherent_ms)
    dopp = fft_acquire.doppler_grid(
        sig.if_freq, acq.doppler_band, acq.doppler_bin_step())
    dopp_dev = jnp.asarray(dopp, jnp.float32)
    if sharding is not None:
        import jax
        dopp_dev = jax.device_put(dopp_dev, sharding)

    cube = fft_acquire.acquire_cube(
        blocks, jnp.asarray(fd_re), jnp.asarray(fd_im), dopp_dev,
        sig.fs, spc, combine=combine)
    spchip = round(sig.fs / sig.code_freq)
    m = fft_acquire.peak_metrics(
        cube, samples_per_code=spc, samples_per_chip=spchip)

    metric = np.asarray(m["metric"])
    code_phase = np.asarray(m["code_phase"])
    best_bin = np.asarray(m["doppler_bin"])
    if acq.prn_list is not None:
        allowed = np.zeros(sd.num_prn, bool)
        allowed[[p - 1 for p in acq.prn_list]] = True
    else:
        allowed = np.ones(sd.num_prn, bool)
    detected = (metric > acq.threshold) & allowed
    carr = dopp[best_bin].astype(np.float64)
    if acq.fine_doppler_ms > 0:
        for i in np.nonzero(detected)[0]:
            carr[i] = refine_doppler(
                samples_iq, sig, int(i) + 1, int(code_phase[i]), carr[i],
                k_ms=acq.fine_doppler_ms)
    return AcqResults(
        peak_metric=metric,
        code_phase=code_phase,
        carr_freq=carr,
        detected=detected,
    )


def acquire_fdma(samples_iq: np.ndarray, sig: SignalConfig, acq: AcqConfig
                 ) -> AcqResults:
    """FDMA acquisition (GLONASS): search frequency channels, not PRNs.

    All satellites share one ranging code and are separated by carrier
    frequency (reference GLONASS/L1/acquisition.sci:95-193 searches
    settings.acqFCHList channels). The whole (channel x Doppler x code
    phase) cube is one device program: a single-code replica row against
    a flattened [channel * doppler] wipeoff grid.

    Result indexing matches the signal's registry PRNs (index 0 = "prn" 1
    = frequency channel sd.carrier_freq-mapped; for GLONASS k = prn - 8).
    carr_freq entries are relative to sig.if_freq's zero channel (i.e.
    include the k * step FDMA offset plus Doppler).
    """
    sd = get_signal(sig.signal)
    spc = sig.samples_per_code
    blocks, combine = _stack_windows(samples_iq, spc, acq)

    fd_re, fd_im = fft_acquire.code_fd_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length, acq.coherent_ms)
    fd_re, fd_im = fd_re[:1], fd_im[:1]       # one shared code row

    # Offsets of each channel's carrier from the zero channel's.
    carr_all = np.array([sd.carrier_freq(p)
                         for p in range(1, sd.num_prn + 1)])
    offs = carr_all - sd.carrier_freq(sd.fdma_zero_prn or 1)

    dopp1 = fft_acquire.doppler_grid(
        0.0, acq.doppler_band, acq.doppler_bin_step())        # [D]
    K, D = sd.num_prn, len(dopp1)
    grid = (sig.if_freq + offs[:, None] + dopp1[None, :]).reshape(-1)

    cube = fft_acquire.acquire_cube(
        blocks, jnp.asarray(fd_re), jnp.asarray(fd_im),
        jnp.asarray(grid, jnp.float32), sig.fs, spc, combine=combine)
    cube = cube.reshape(K, D, spc)
    spchip = round(sig.fs / sig.code_freq)
    m = fft_acquire.peak_metrics(
        cube, samples_per_code=spc, samples_per_chip=spchip)

    metric = np.asarray(m["metric"])
    best_bin = np.asarray(m["doppler_bin"])
    carr = (offs + dopp1[best_bin] + sig.if_freq).astype(np.float64)
    detected = metric > acq.threshold
    if acq.prn_list is not None:
        allowed = np.zeros(K, bool)
        allowed[[p - 1 for p in acq.prn_list]] = True
        detected &= allowed
    if acq.fine_doppler_ms > 0:
        cps = np.asarray(m["code_phase"])
        for i in np.nonzero(detected)[0]:
            carr[i] = refine_doppler(
                samples_iq, sig, int(i) + 1, int(cps[i]), carr[i],
                k_ms=acq.fine_doppler_ms)
    return AcqResults(
        peak_metric=metric,
        code_phase=np.asarray(m["code_phase"]),
        carr_freq=carr,
        detected=detected,
    )
