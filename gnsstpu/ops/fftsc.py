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
from typing import Tuple

import jax.numpy as jnp
import numpy as np


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
