"""Batched FFT circular-correlation acquisition kernel.

The TPU form of the reference's acquisition engines:
  * Scilab FFT search (GPS/L1/acquisition.sci:91-187): per-PRN replica FFT,
    per-Doppler-bin carrier wipeoff + FFT + conj-multiply + IFFT,
    max over two alternating coherent blocks to dodge nav-bit flips;
  * realtime tiers (objects/acquisition.cpp:244/309/433): coherent N ms and
    noncoherent K-fold combining.

Here the whole (PRN x Doppler x code-phase) cube is one batched device
program: the carrier wipeoff + forward FFT is computed once per Doppler bin
(it is PRN-independent) and the per-PRN inverse FFTs run as a scanned batch.
Sharding over mesh axes lives in gnsstpu.parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.ops import code_tables


def doppler_grid(if_freq: float, band_hz: float, step_hz: float) -> np.ndarray:
    """Carrier-frequency search grid [D] (acquisition.sci:101-104)."""
    n = round(band_hz / step_hz) + 1
    return if_freq - band_hz / 2 + step_hz * np.arange(n)


def code_fd_table(signal: str, fs: float, code_freq: float, code_length: int,
                  coh_periods: int) -> np.ndarray:
    """conj(FFT(code tiled over the coherent window)) for all PRNs.

    [P, coh_periods*samples_per_code] complex64 — the equivalent of the
    reference's precomputed frequency-domain replicas (prn_codes.h) /
    caCodeFreqDom (acquisition.sci:95).
    """
    table = code_tables.sampled_code_table(signal, fs, code_freq, code_length)
    tiled = np.tile(table.astype(np.float32), (1, coh_periods))
    return np.conj(np.fft.fft(tiled, axis=1)).astype(np.complex64)


@functools.partial(
    jax.jit, static_argnames=("combine", "prn_chunk")
)
def acquire_cube(
    blocks: jax.Array,
    code_fd: jax.Array,
    doppler_hz: jax.Array,
    fs: float,
    *,
    combine: str = "max",
    prn_chunk: int = 4,
) -> jax.Array:
    """Correlation power cube over (PRN, Doppler, code phase).

    Args:
      blocks: complex64 [B, L] — B coherent blocks of L samples
        (B=2 alternating blocks for bit-flip dodging, or B=K noncoherent).
      code_fd: complex64 [P, L] from code_fd_table.
      doppler_hz: f32 [D] absolute carrier frequencies to wipe off.
      fs: sampling frequency.
      combine: 'max' (alternating-block dodge, acquisition.sci:126-132)
        or 'sum' (noncoherent accumulation, acquisition.cpp:433).

    Returns f32 [P, D, L] correlation power (only the first
    samples_per_code columns are distinct; callers slice).
    """
    B, L = blocks.shape
    P = code_fd.shape[0]
    t = jnp.arange(L, dtype=jnp.float32) * jnp.float32(1.0 / fs)
    # Wipeoff phase per bin: exp(-i*2*pi*f*t). PRN-independent.
    ang = (2.0 * jnp.pi) * doppler_hz[:, None] * t[None, :]
    lo = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))          # [D, L]
    w = jnp.fft.fft(blocks[:, None, :] * lo[None, :, :], axis=-1)  # [B, D, L]

    def one_chunk(code_fd_chunk):
        # [B, D, c, L] inverse FFTs -> power -> combine over B.
        prod = w[:, :, None, :] * code_fd_chunk[None, None, :, :]
        power = jnp.abs(jnp.fft.ifft(prod, axis=-1)) ** 2
        if combine == "sum":
            return jnp.sum(power, axis=0)
        return jnp.max(power, axis=0)

    chunks = code_fd.reshape(P // prn_chunk, prn_chunk, L) \
        if P % prn_chunk == 0 else code_fd[:, None, :]
    out = jax.lax.map(one_chunk, chunks)          # [P/c, D, c, L]
    return out.transpose(0, 2, 1, 3).reshape(P, -1, L)


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
