"""Split-complex radix-2 Stockham FFT (power-of-2, float32 re/im pairs).

The TPU backend exposes no complex dtype (and TPUs have no complex ALU),
so every FFT in the framework runs on separate re/im float32 arrays. The
Stockham autosort formulation needs no bit-reversal permutation — each of
the log2(N) stages is a slice + butterfly + twiddle multiply + reshape,
which XLA fuses into a few vectorized kernels; twiddle tables are
host-precomputed constants.

Replaces the role of the reference's fixed-point radix-2 FFT
(REALTIME_RECEIVERS/.../objects/fft.cpp, fft.h:28-60) and Scilab's
built-in fft used by acquisition.sci.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: The valid fft_mode strings shared by every FFT-mode consumer
#: (ops.fft_acquire.acquire_cube, parallel.timeblock.long_coherent_acquire).
FFT_MODES = ("auto", "stockham", "mm", "mm_bf16")


def resolve_fft_mode(fft_mode: str, *, auto_tpu: str = "mm_bf16") -> str:
    """Validate an fft_mode string and resolve 'auto' for this backend.

    auto_tpu: what 'auto' means on a TPU backend ('mm_bf16' for the cold
    search, 'mm' f32 where bf16 sensitivity is untested — e.g. weak-signal
    long coherent integration). Off-TPU 'auto' is always 'stockham'.
    """
    if fft_mode not in FFT_MODES:
        raise ValueError(
            f"fft_mode {fft_mode!r} not in {FFT_MODES}")
    if fft_mode == "auto":
        return auto_tpu if jax.default_backend() == "tpu" else "stockham"
    return fft_mode


@functools.lru_cache(maxsize=None)
def _twiddles(n: int, inverse: bool) -> Tuple[Tuple[np.ndarray, np.ndarray],
                                              ...]:
    """Per-stage (cos, sin) twiddle tables for a length-n Stockham DIF."""
    out = []
    p = n
    while p > 1:
        m = p // 2
        theta = 2.0 * np.pi * np.arange(m) / p
        s = np.sin(theta)
        out.append((np.cos(theta).astype(np.float32),
                    (s if inverse else -s).astype(np.float32)))
        p = m
    return tuple(out)


def fft_sc(re: jnp.ndarray, im: jnp.ndarray, inverse: bool = False
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DFT over the last axis; length must be a power of 2.

    re, im: f32 [..., n]. Returns (re, im) of the (i)DFT in natural order.
    The inverse includes the 1/n scale.
    """
    n = re.shape[-1]
    if n & (n - 1):
        raise ValueError(f"length {n} not a power of 2")
    batch = re.shape[:-1]
    # State: [..., P, S] with P*S = n; start P=n, S=1.
    xr = re.reshape(*batch, n, 1)
    xi = im.reshape(*batch, n, 1)
    for wr_np, wi_np in _twiddles(n, inverse):
        m = xr.shape[-2] // 2
        wr = jnp.asarray(wr_np)[:, None]
        wi = jnp.asarray(wi_np)[:, None]
        ar, ai = xr[..., :m, :], xi[..., :m, :]
        br, bi = xr[..., m:, :], xi[..., m:, :]
        sr, si = ar + br, ai + bi
        dr, di = ar - br, ai - bi
        tr = dr * wr - di * wi
        ti = dr * wi + di * wr
        s = xr.shape[-1]
        xr = jnp.stack([sr, tr], axis=-2).reshape(*batch, m, 2 * s)
        xi = jnp.stack([si, ti], axis=-2).reshape(*batch, m, 2 * s)
    xr = xr.reshape(*batch, n)
    xi = xi.reshape(*batch, n)
    if inverse:
        scale = jnp.float32(1.0 / n)
        return xr * scale, xi * scale
    return xr, xi


# ---------------------------------------------------------------------------
# Four-step (Bailey) DFT as two batched matmuls — the MXU formulation.
#
# The Stockham path above is pure VPU work (butterflies + lane shuffles);
# on a TPU the FLOP majority of the chip sits idle while it runs. Writing
# the length-N DFT as an (n1 x n2) decomposition turns it into two dense
# [.., n] @ [n, n] products plus one elementwise twiddle, which XLA maps
# straight onto the systolic array:
#
#   x[a, b] = x_lin[a*n2 + b]
#   A[b, c] = sum_a x[a, b] * F1[a, c],        F1[a, c] = w_n1^(a c)
#   B[b, c] = A[b, c] * T[b, c],               T[b, c]  = w_N^(b c)
#   X[c, d] = sum_b B[b, c] * F2[b, d],        F2[b, d] = w_n2^(b d)
#   X_lin[c + n1*d] = X[c, d]   (flatten [d, c] row-major)
#
# ~17x more FLOPs than Stockham at N=4096, but they run at MXU rate
# instead of VPU rate. `dtype=bfloat16` runs the matmul operands in bf16
# with f32 accumulation — acquisition's peak/second-peak detection metric
# tolerates the ~0.5% spectrum error with margin (BENCH_NOTES.md §2).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mm_consts(n: int, inverse: bool):
    """DFT factor matrices for the four-step decomposition of length n."""
    if n & (n - 1) or n < 4:
        raise ValueError(f"length {n} not a power of 2 (>= 4)")
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    sgn = 1.0 if inverse else -1.0

    def dft(rows, cols, denom):
        ang = sgn * 2.0 * np.pi * np.outer(np.arange(rows),
                                           np.arange(cols)) / denom
        return (np.cos(ang).astype(np.float32),
                np.sin(ang).astype(np.float32))

    f1 = dft(n1, n1, n1)          # F1[a, c]
    t = dft(n2, n1, n)            # T[b, c]
    f2 = dft(n2, n2, n2)          # F2[b, d]
    return n1, n2, f1, t, f2


def fft_sc_mm(re: jnp.ndarray, im: jnp.ndarray, inverse: bool = False,
              dtype: Optional[jnp.dtype] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Four-step DFT over the last axis via two MXU matmuls.

    Same contract as fft_sc (power-of-2 length, natural order, 1/n scale
    on the inverse). dtype: optional matmul operand dtype (bfloat16 for
    full MXU rate); accumulation is always float32.
    """
    n = re.shape[-1]
    n1, n2, (f1r, f1i), (tr, ti), (f2r, f2i) = _mm_consts(n, inverse)
    batch = re.shape[:-1]

    def mm(a, b):
        if dtype is not None:
            a, b = a.astype(dtype), jnp.asarray(b, dtype)
            return jnp.matmul(a, b, preferred_element_type=jnp.float32)
        # dtype=None is the documented exact-f32 fallback; TPU default
        # matmul precision would demote the operands to bf16 passes, so
        # force full-f32 MXU passes here.
        return jnp.matmul(a, jnp.asarray(b),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    # [..., a, b] -> [..., b, a]: contraction dim innermost for the MXU.
    xr = re.reshape(*batch, n1, n2).swapaxes(-1, -2)
    xi = im.reshape(*batch, n1, n2).swapaxes(-1, -2)
    ar = mm(xr, f1r) - mm(xi, f1i)                   # [..., b, c]
    ai = mm(xi, f1r) + mm(xr, f1i)
    br = ar * tr - ai * ti
    bi = ai * tr + ar * ti
    br, bi = br.swapaxes(-1, -2), bi.swapaxes(-1, -2)  # [..., c, b]
    yr = mm(br, f2r) - mm(bi, f2i)                   # [..., c, d]
    yi = mm(bi, f2r) + mm(br, f2i)
    yr = yr.swapaxes(-1, -2).reshape(*batch, n)      # k = c + n1*d
    yi = yi.swapaxes(-1, -2).reshape(*batch, n)
    if inverse:
        scale = jnp.float32(1.0 / n)
        return yr * scale, yi * scale
    return yr, yi
