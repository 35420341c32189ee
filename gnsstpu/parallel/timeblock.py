"""Time-block sharded long coherent acquisition (overlap-save over ICI).

The SP/CP slot of the framework (SURVEY.md §2.8 item 3): the reference's
long-integration techniques — 10 ms coherent / 310 ms buffers
(objects/acquisition.cpp:95,433), multi-ms Scilab windows — run on one
core; here a K-code-period coherent correlation is sharded over the
"time" axis of a device mesh:

  * each device holds a contiguous Lb = (K/B)*spc sample block
    ([B, Lb, 2] sharded on axis 0);
  * the overlap-save halo (one code period of boundary samples each
    device needs from its right neighbor) moves over ICI with
    lax.ppermute — the framework's boundary-exchange collective;
  * each device wipes its block with the *globally correct* carrier
    phase (phase offset from lax.axis_index — no phase discontinuity at
    block seams), FFT-correlates it against the tiled replica locally,
    and the partial complex correlations coherently combine with
    lax.psum — correlation is linear in the data, so
    sum_b corr_b(tau) == corr_full(tau) exactly.

Power is formed only after the psum, preserving full coherent gain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnsstpu.config import SignalConfig
from gnsstpu.ops import code_tables
from gnsstpu.ops.fft_acquire import next_pow2
from gnsstpu.ops.fftsc import fft_sc, fft_sc_mm, resolve_fft_mode


def long_coherent_acquire(
    samples_iq: np.ndarray,
    sig: SignalConfig,
    prns,
    doppler_hz: np.ndarray,
    mesh: Mesh,
    *,
    k_periods: int,
    axis: str = "time",
    fft_mode: str = "auto",
) -> jax.Array:
    """Coherent K-code-period correlation power, time-sharded.

    Args:
      samples_iq: f32 [>= K*spc + spc, 2] leading samples.
      prns: PRNs to search (replica rows; replicated across the mesh).
      doppler_hz: [D] absolute carrier frequencies (replicated).
      mesh: mesh with a sharded `axis` of size B; K must divide by B and
        K/B code periods must fit per device.
      k_periods: K, total coherent code periods.

    Returns f32 [P, D, spc] coherent correlation power (peak_metrics
    applies unchanged).
    """
    spc = sig.samples_per_code
    B = mesh.shape[axis]
    if k_periods % B:
        raise ValueError(f"k_periods {k_periods} not divisible by B={B}")
    kb = k_periods // B
    lb = kb * spc
    need = k_periods * spc + spc
    if samples_iq.shape[0] < need:
        raise ValueError(f"need >= {need} samples")

    # [B, Lb, 2] sharded blocks + the one-period tail after the last
    # block (the halo source for device B-1), replicated.
    blocks = np.asarray(samples_iq[: B * lb], np.float32).reshape(B, lb, 2)
    tail = np.asarray(samples_iq[B * lb: B * lb + spc], np.float32)

    # Tiled-replica frequency table for one device block: conj(FFT(code
    # tiled kb times, zero-padded)) — same rows on every device (the code
    # is spc-periodic, so every block sees the same replica segment).
    table = code_tables.sampled_code_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length)
    rows = np.stack([table[p - 1] for p in prns]).astype(np.float32)
    npad = next_pow2(lb + spc)
    tiled = np.zeros((len(prns), npad), np.float32)
    tiled[:, :lb] = np.tile(rows, (1, kb))
    fd = np.conj(np.fft.fft(tiled, axis=1))
    fd_re = jnp.asarray(fd.real, jnp.float32)
    fd_im = jnp.asarray(fd.imag, jnp.float32)

    dopp = jnp.asarray(doppler_hz, jnp.float32)
    blocks_dev = jax.device_put(
        jnp.asarray(blocks), NamedSharding(mesh, P(axis, None, None)))
    tail_dev = jax.device_put(jnp.asarray(tail), NamedSharding(mesh, P()))

    inv_fs = 1.0 / sig.fs
    two_pi = 2.0 * np.pi

    # Same FFT-mode contract as ops.fft_acquire.acquire_cube, except
    # 'auto' on TPU picks the exact-f32 matmul DFT: long coherent
    # integration exists for weak signals, where the cold-search bf16
    # detection-margin argument (BENCH_NOTES.md §2) has not been
    # validated; 'mm_bf16' remains an explicit opt-in.
    fft_mode = resolve_fft_mode(fft_mode, auto_tpu="mm")
    if fft_mode == "stockham":
        _fft = fft_sc
    else:
        _dt = jnp.bfloat16 if fft_mode == "mm_bf16" else None
        _fft = functools.partial(fft_sc_mm, dtype=_dt)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None, None), P(), P(), P(), P()),
        out_specs=P(),
    )
    def sharded(blk, tail, fd_re, fd_im, dopp):
        x = blk[0]                                     # [Lb, 2] local
        b = jax.lax.axis_index(axis)
        # Overlap-save halo: first spc samples of the right neighbor
        # (device B-1, which has no right neighbor and receives zeros,
        # takes the replicated tail instead).
        if B > 1:
            halo = jax.lax.ppermute(
                x[:spc], axis, [(i + 1, i) for i in range(B - 1)])
            halo = jnp.where(b == B - 1, tail, halo)
        else:
            halo = tail
        xw = jnp.concatenate([x, halo], axis=0)        # [Lb + spc, 2]

        # Globally-phased carrier wipeoff: sample n_global = b*Lb + m.
        m = jnp.arange(lb + spc, dtype=jnp.float32)
        t = (b.astype(jnp.float32) * jnp.float32(lb) + m) * jnp.float32(
            inv_fs)
        ang = jnp.float32(two_pi) * dopp[:, None] * t[None, :]  # [D, n]
        lo_c, lo_s = jnp.cos(ang), jnp.sin(ang)
        xr, xi = xw[:, 0], xw[:, 1]
        wr = xr * lo_c + xi * lo_s                     # [D, Lb+spc]
        wi = xi * lo_c - xr * lo_s
        pad = ((0, 0), (0, npad - (lb + spc)))
        frr, fii = _fft(jnp.pad(wr, pad), jnp.pad(wi, pad))

        # Multiply with conj replica rows, IFFT, keep lags [0, spc).
        pr = frr[None] * fd_re[:, None] - fii[None] * fd_im[:, None]
        pi = frr[None] * fd_im[:, None] + fii[None] * fd_re[:, None]
        br, bi = _fft(pr, pi, inverse=True)           # [P, D, npad]
        cr, ci = br[..., :spc], bi[..., :spc]
        # Coherent combine across time blocks BEFORE forming power.
        cr = jax.lax.psum(cr, axis)
        ci = jax.lax.psum(ci, axis)
        return cr * cr + ci * ci

    return sharded(blocks_dev, tail_dev, fd_re, fd_im, dopp)


def reference_coherent_power(samples_iq: np.ndarray, sig: SignalConfig,
                             prns, doppler_hz: np.ndarray,
                             k_periods: int) -> np.ndarray:
    """Single-device NumPy oracle for long_coherent_acquire (same math,
    no sharding): f64 [P, D, spc]."""
    spc = sig.samples_per_code
    L = k_periods * spc
    x = samples_iq[: L + spc]
    xc = x[:, 0].astype(np.float64) + 1j * x[:, 1]
    table = code_tables.sampled_code_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length)
    npad = next_pow2(L + spc)
    out = np.zeros((len(prns), len(doppler_hz), spc))
    t = np.arange(L + spc) / sig.fs
    for pi_, p in enumerate(prns):
        code = np.tile(table[p - 1].astype(np.float64), k_periods)
        fd = np.conj(np.fft.fft(code, npad))
        for di, f in enumerate(doppler_hz):
            w = xc * np.exp(-2j * np.pi * f * t)
            c = np.fft.ifft(np.fft.fft(w, npad) * fd)[:spc]
            out[pi_, di] = np.abs(c) ** 2
    return out
