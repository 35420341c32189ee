"""Batched FFT correlation acquisition kernel (split-complex, TPU-native).

The TPU form of the reference's acquisition engines:
  * Scilab FFT search (GPS/L1/acquisition.sci:91-187): per-PRN replica FFT,
    per-Doppler-bin carrier wipeoff + FFT + conj-multiply + IFFT,
    max over two alternating coherent blocks to dodge nav-bit flips;
  * realtime tiers (objects/acquisition.cpp:244/309/433): coherent N ms and
    noncoherent K-fold combining.

TPU-first differences from the reference:
  * no complex dtype anywhere — I/Q ride as separate f32 planes through a
    split-complex Stockham FFT (gnsstpu.ops.fftsc);
  * circular correlation is replaced by zero-padded *linear* correlation
    to the next power of 2: the data window carries one extra code period
    of real samples, so lags [0, samples_per_code) are exact for any
    sample rate (the reference needs L to match the FFT size; the Scilab
    COMPASS receiver's zero-padded 2x FFT, COMPASS/B1/acquisition.sci:89,
    is the same idea).

The whole (PRN x Doppler x code-phase) cube is one batched device program.
Sharding over mesh axes lives in gnsstpu.parallel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.ops import code_tables
from gnsstpu.ops.fftsc import fft_sc, fft_sc_mm, resolve_fft_mode


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def doppler_grid(if_freq: float, band_hz: float, step_hz: float) -> np.ndarray:
    """Carrier-frequency search grid [D] (acquisition.sci:101-104)."""
    n = round(band_hz / step_hz) + 1
    return if_freq - band_hz / 2 + step_hz * np.arange(n)


def window_len(samples_per_code: int, coh_periods: int) -> int:
    """Samples per coherent window incl. the extra code period of tail."""
    return (coh_periods + 1) * samples_per_code


def code_fd_table(signal: str, fs: float, code_freq: float, code_length: int,
                  coh_periods: int) -> Tuple[np.ndarray, np.ndarray]:
    """conj(FFT(code tiled over the coherent window, zero-padded)) for all
    PRNs: (re, im) f32 [P, Npad].

    The equivalent of the reference's precomputed frequency-domain
    replicas (accessories/prn_codes.h / caCodeFreqDom acquisition.sci:95).
    """
    table = code_tables.sampled_code_table(signal, fs, code_freq, code_length)
    spc = table.shape[1]
    L = coh_periods * spc
    npad = next_pow2(L + spc)
    tiled = np.zeros((table.shape[0], npad), np.float32)
    tiled[:, :L] = np.tile(table.astype(np.float32), (1, coh_periods))
    fd = np.conj(np.fft.fft(tiled, axis=1))
    return fd.real.astype(np.float32), fd.imag.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("fs", "samples_per_code", "combine",
                              "prn_chunk", "fft_mode")
)
def acquire_cube(
    blocks_iq: jax.Array,
    code_fd_re: jax.Array,
    code_fd_im: jax.Array,
    doppler_hz: jax.Array,
    fs: float,
    samples_per_code: int,
    *,
    combine: str = "max",
    prn_chunk: int = 0,
    fft_mode: str = "auto",
) -> jax.Array:
    """Correlation power cube over (PRN, Doppler, code phase).

    Args:
      blocks_iq: f32 [B, Lw, 2] — B coherent windows of Lw samples, each
        carrying one extra code period of tail (window_len()); B=2
        alternating windows for bit-flip dodging, or B=K noncoherent.
      code_fd_re/im: f32 [P, Npad] from code_fd_table.
      doppler_hz: f32 [D] absolute carrier frequencies to wipe off.
      fs: sampling frequency (static).
      samples_per_code: lags to keep (static).
      combine: 'max' (alternating-block dodge, acquisition.sci:126-132)
        or 'sum' (noncoherent accumulation, acquisition.cpp:433).
      fft_mode: 'stockham' (exact VPU path), 'mm' / 'mm_bf16' (four-step
        MXU matmul DFT, fftsc.fft_sc_mm; bf16 operands at full MXU rate),
        or 'auto' = mm_bf16 on a TPU backend, stockham elsewhere.
      prn_chunk: PRNs per lax.map step; 0 = per-mode VMEM sweet spot
        measured on v5e (BENCH_NOTES.md §2): 2 for the matmul modes,
        8 for Stockham.

    Returns f32 [P, D, samples_per_code] correlation power.
    """
    B, Lw, _ = blocks_iq.shape
    P, npad = code_fd_re.shape
    spc = samples_per_code

    fft_mode = resolve_fft_mode(fft_mode)
    if fft_mode == "stockham":
        _fft = fft_sc
        prn_chunk = prn_chunk or 8
    else:
        dt = jnp.bfloat16 if fft_mode == "mm_bf16" else None
        _fft = functools.partial(fft_sc_mm, dtype=dt)
        prn_chunk = prn_chunk or 2

    t = jnp.arange(Lw, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    ang = (2.0 * jnp.pi) * doppler_hz[:, None] * t[None, :]     # [D, Lw]
    lo_c, lo_s = jnp.cos(ang), jnp.sin(ang)
    xr = blocks_iq[:, None, :, 0]                                # [B, 1, Lw]
    xi = blocks_iq[:, None, :, 1]
    # Wipeoff x * exp(-i*ang).
    wr = xr * lo_c + xi * lo_s                                   # [B, D, Lw]
    wi = xi * lo_c - xr * lo_s
    pad = ((0, 0), (0, 0), (0, npad - Lw))
    fr, fi = _fft(jnp.pad(wr, pad), jnp.pad(wi, pad))            # [B, D, Npad]

    def one_chunk(code_chunk):
        cr, ci = code_chunk                                      # [c, Npad]
        # (f * code_fd) with code_fd already conjugated.
        pr = fr[:, :, None, :] * cr[None, None] - fi[:, :, None, :] * ci[None, None]
        pi = fr[:, :, None, :] * ci[None, None] + fi[:, :, None, :] * cr[None, None]
        br, bi = _fft(pr, pi, inverse=True)                      # [B, D, c, Npad]
        power = (br * br + bi * bi)[..., :spc]
        if combine == "sum":
            return jnp.sum(power, axis=0)
        return jnp.max(power, axis=0)                            # [D, c, spc]

    # Pad the PRN axis to a chunk multiple (zero replica rows correlate
    # to zero; cropped below) so odd PRN counts — a 63-PRN GLONASS set,
    # a user subset — keep the tuned VMEM-sweet-spot chunk size instead
    # of silently degrading to one-PRN steps.
    Pp = -(-P // prn_chunk) * prn_chunk
    if Pp != P:
        pad_rows = ((0, Pp - P), (0, 0))
        code_fd_re = jnp.pad(code_fd_re, pad_rows)
        code_fd_im = jnp.pad(code_fd_im, pad_rows)
    chunks = (code_fd_re.reshape(Pp // prn_chunk, prn_chunk, npad),
              code_fd_im.reshape(Pp // prn_chunk, prn_chunk, npad))
    out = jax.lax.map(one_chunk, chunks)                         # [Pp/c, D, c, spc]
    return out.transpose(0, 2, 1, 3).reshape(Pp, -1, spc)[:P]


@functools.partial(jax.jit, static_argnames=("samples_per_code",
                                             "samples_per_chip"))
def peak_metrics(cube: jax.Array, *, samples_per_code: int,
                 samples_per_chip: int):
    """Peak / second-peak detection per PRN (acquisition.sci:136-169).

    The second peak is the largest value in the best Doppler row outside
    +-1 chip of the main peak.

    Returns dict of [P] arrays: metric, code_phase (samples), doppler_bin.
    """
    c = cube[:, :, :samples_per_code]                       # [P, D, S]
    row_peak = jnp.max(c, axis=2)                            # [P, D]
    best_bin = jnp.argmax(row_peak, axis=1)                  # [P]
    best_row = jnp.take_along_axis(
        c, best_bin[:, None, None], axis=1
    )[:, 0, :]                                               # [P, S]
    code_phase = jnp.argmax(best_row, axis=1)                # [P]
    peak = jnp.max(best_row, axis=1)

    # Exclude +-1 chip (circularly) around the peak.
    s = jnp.arange(samples_per_code, dtype=jnp.int32)
    dist = jnp.abs(s[None, :] - code_phase[:, None])
    dist = jnp.minimum(dist, samples_per_code - dist)
    masked = jnp.where(dist > samples_per_chip, best_row, -jnp.inf)
    second = jnp.max(masked, axis=1)

    return {
        "metric": peak / jnp.maximum(second, 1e-30),
        "code_phase": code_phase,
        "doppler_bin": best_bin,
        "peak": peak,
    }
