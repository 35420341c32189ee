"""Resampled ranging-code tables.

Equivalent of the reference's makeCaTable
(GPS/L1/include/makeCaTable.sci) and of the realtime receiver's pre-sampled
PRN rows (correlator.cpp SamplePRN) / baked FFT replicas (prn_codes.h):
codes are expanded once on the host to the sampling grid and cached, then
moved to device as a [num_prn, samples_per_code] matrix that acquisition and
tracking kernels reuse.
"""

from __future__ import annotations

import functools

import numpy as np

from gnsstpu.signals.registry import get_signal


@functools.lru_cache(maxsize=None)
def sampled_code_table(signal: str, fs: float, code_freq: float,
                       code_length: int) -> np.ndarray:
    """All PRN codes sampled at fs over one code period.

    Sample k holds the chip active at instant k/fs: chip index
    floor(k*code_freq/fs). (Same role as the reference's makeCaTable.sci,
    but point-sampled at interval starts rather than its interval-end ceil
    — see gnsstpu.ops.correlate for the convention note.)
    Returns ±1 int8 [num_prn, samples_per_code].
    """
    sd = get_signal(signal)
    spc = round(fs * code_length / code_freq)
    k = np.arange(spc, dtype=np.float64)
    idx = np.floor(k * code_freq / fs).astype(np.int64)
    idx = np.clip(idx, 0, code_length - 1)
    rows = [sd.code_fn(prn)[idx] for prn in range(1, sd.num_prn + 1)]
    return np.stack(rows).astype(np.int8)


@functools.lru_cache(maxsize=None)
def padded_code_table(signal: str) -> np.ndarray:
    """Codes padded by one chip on each side for early/late indexing.

    padded[0] = last chip, padded[1:L+1] = code, padded[L+1] = first chip —
    matches the reference's caCode = [caCode($) caCode caCode(1)]
    (tracking.sci:142). Chip phase t (chips, in (-1, L+spacing)) maps to
    index ceil(t) + 1. Returns ±1 int8 [num_prn, code_length + 2].
    """
    sd = get_signal(signal)
    out = np.empty((sd.num_prn, sd.code_length + 2), dtype=np.int8)
    for prn in range(1, sd.num_prn + 1):
        c = sd.code_fn(prn)
        out[prn - 1, 0] = c[-1]
        out[prn - 1, 1:-1] = c
        out[prn - 1, -1] = c[0]
    return out
