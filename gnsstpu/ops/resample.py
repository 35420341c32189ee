"""Rational-rate IF resampling (front-end rate -> processing rate).

The reference receiver conditions every source to 2.048 Msps before
correlation: USRP 64/65.536 Msps decimated by 16+LUT, GN3S 8.1838 Msps
and the custom 16 Msps front end via a nearest-sample index table
(objects/gps_source.cpp:436 `Resample_USRP_V1`, used at :566-667;
target rate includes/defines.h:150-151).

Two modes are provided:

  * ``nearest`` — the reference's semantics: pick the nearest input
    sample per output tick (zero-order hold; no anti-alias filter).
    Cheap, bit-compatible with the C++ receiver's behavior.
  * ``polyphase`` — proper anti-aliased rational P/Q conversion with a
    Kaiser-windowed-sinc prototype, evaluated as a gather + weighted
    reduction over K taps per output sample. This is the TPU-native
    formulation: a static-shape [count, K] gather feeding a dot with a
    per-sample weight row, which XLA fuses into one pass over HBM.

Random access is first-class: ``ResampledSource`` serves
``read(start, count)`` at the output rate from any ``SampleSource``,
reading only the input span each window needs, so the tracking driver's
prefetch pattern is preserved.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np


def rational_ratio(fs_in: float, fs_out: float,
                   max_den: int = 1 << 16) -> tuple:
    """(p, q) with fs_out/fs_in ~= p/q, reduced."""
    r = Fraction(fs_out / fs_in).limit_denominator(max_den)
    return r.numerator, r.denominator


def kaiser_lowpass(n_taps: int, cutoff: float, beta: float = 8.6
                   ) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, unit DC gain.

    cutoff is normalized to Nyquist (1.0 = fs/2). No scipy: the Kaiser
    window uses np.i0 directly.
    """
    m = np.arange(n_taps, dtype=np.float64)
    center = (n_taps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * (m - center))
    x = 2.0 * m / (n_taps - 1) - 1.0
    w = np.i0(beta * np.sqrt(np.maximum(1.0 - x * x, 0.0))) / np.i0(beta)
    h = h * w
    return h / h.sum()


class PolyphaseBank:
    """Prototype lowpass split into p phases of K taps each.

    The prototype runs at the upsampled rate p*fs_in with cutoff
    min(fs_in, fs_out)/2; gain p restores unit passband after the
    zero-stuffing model. Odd prototype length (K*p - 1) keeps the group
    delay an integer number of upsampled samples, so resampled output
    sample n is time-aligned with input time n*q/p exactly.
    """

    def __init__(self, p: int, q: int, taps_per_phase: int = None,
                 beta: float = 8.6):
        if taps_per_phase is None:
            # ~32 taps at the *slower* of the two rates, so decimators
            # get a sharp enough prototype (droop < 1% in band)
            taps_per_phase = max(32, 2 * int(np.ceil(16.0 * q / p)))
        if taps_per_phase % 2:
            taps_per_phase += 1
        self.p, self.q, self.K = p, q, taps_per_phase
        L = taps_per_phase * p - 1
        cutoff = 1.0 / max(p, q)  # of upsampled Nyquist p*fs_in/2
        h = kaiser_lowpass(L, cutoff) * p
        h = np.concatenate([h, [0.0]])
        # bank[k, phase] = h[k*p + phase]
        self.bank = np.asarray(h.reshape(taps_per_phase, p), np.float32)
        self.group_delay_up = L // 2  # integer, in upsampled samples

    def window(self, start_out: int, count: int):
        """(base_idx [count], weights [count, K]) for outputs
        [start_out, start_out+count): y[n] = sum_k w[n,k] x[base[n]+k]."""
        n = np.arange(start_out, start_out + count, dtype=np.int64)
        t = n * self.q + self.group_delay_up
        b = t // self.p
        phase = (t - b * self.p).astype(np.int32)
        # y[n] = sum_k h[phase + p*k] x[b - k]  ->  ascending-index form
        base = (b - (self.K - 1)).astype(np.int64)
        w = self.bank[::-1, :][:, phase].T  # [count, K]
        return base, np.ascontiguousarray(w)


@functools.lru_cache(maxsize=8)
def _apply_jit(count: int, K: int):
    import jax
    import jax.numpy as jnp

    def apply(x, rel_base, w):
        # x: [M, 2] f32; rel_base: [count] int32 into x; w: [count, K]
        k = jnp.arange(K, dtype=jnp.int32)
        idx = rel_base[:, None] + k[None, :]          # [count, K]
        win = x[idx]                                   # [count, K, 2]
        return jnp.einsum("nk,nkc->nc", w, win)

    return jax.jit(apply)


def polyphase_resample(x: np.ndarray, p: int, q: int,
                       taps_per_phase: int = None) -> np.ndarray:
    """Whole-array rational resample of iq [N, 2] to ceil(N*p/q) samples."""
    bank = PolyphaseBank(p, q, taps_per_phase)
    n_out = -(-len(x) * p // q)
    base, w = bank.window(0, n_out)
    lo = int(base.min())
    pad_lo = max(-lo, 0)
    hi = int(base.max()) + bank.K
    pad_hi = max(hi - len(x), 0)
    xp = np.pad(np.asarray(x, np.float32), ((pad_lo, pad_hi), (0, 0)))
    fn = _apply_jit(n_out, bank.K)
    import jax.numpy as jnp
    out = fn(jnp.asarray(xp), jnp.asarray(base + pad_lo, jnp.int32),
             jnp.asarray(w))
    return np.asarray(out)


def nearest_indices(fs_in: float, fs_out: float, start_out: int,
                    count: int) -> np.ndarray:
    """Input sample index per output tick (Resample_USRP_V1 semantics:
    zero-order-hold index table, gps_source.cpp:436)."""
    n = np.arange(start_out, start_out + count, dtype=np.float64)
    return np.floor(n * (fs_in / fs_out) + 0.5).astype(np.int64)


class ResampledSource:
    """SampleSource adapter: serve an inner source at a new rate.

    mode 'polyphase' (anti-aliased rational P/Q) or 'nearest'
    (reference-compatible zero-order hold).
    """

    def __init__(self, inner, fs_in: float, fs_out: float,
                 mode: str = "polyphase", taps_per_phase: int = None):
        if mode not in ("polyphase", "nearest"):
            raise ValueError(f"unknown mode {mode!r}")
        self.inner = inner
        self.fs_in, self.fs_out = fs_in, fs_out
        self.mode = mode
        self._n = int(len(inner) * fs_out / fs_in)
        if mode == "polyphase":
            p, q = rational_ratio(fs_in, fs_out)
            self.p, self.q = p, q
            self.bank = PolyphaseBank(p, q, taps_per_phase)

    def read(self, start: int, count: int) -> np.ndarray:
        if self.mode == "nearest":
            idx = nearest_indices(self.fs_in, self.fs_out, start, count)
            lo = int(idx[0])
            x = self._read_padded(lo, int(idx[-1]) - lo + 1)
            return x[idx - lo]
        base, w = self.bank.window(start, count)
        lo = int(base.min())
        hi = int(base.max()) + self.bank.K
        x = self._read_padded(lo, hi - lo)
        fn = _apply_jit(count, self.bank.K)
        import jax.numpy as jnp
        out = fn(jnp.asarray(x), jnp.asarray(base - lo, jnp.int32),
                 jnp.asarray(w))
        return np.asarray(out)

    def _read_padded(self, start: int, count: int) -> np.ndarray:
        """inner.read that also zero-pads before sample 0 (file sources
        cannot seek negative)."""
        if start >= 0:
            return self.inner.read(start, count)
        out = np.zeros((count, 2), np.float32)
        if count + start > 0:
            out[-start:] = self.inner.read(0, count + start)
        return out

    def __len__(self) -> int:
        return self._n
