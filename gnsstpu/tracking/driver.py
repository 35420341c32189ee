"""Host tracking driver: chunked streaming around the device scan engine.

Equivalent role to the reference's per-channel tracking outer loop
(tracking.sci:124-358) and the realtime Correlator thread's per-ms walk
(correlator.cpp:160-262), restructured for a device: the host prefetches
multi-hundred-ms sample chunks, the device runs the whole
(blocks x channels) scan in one XLA program, and the host keeps the
float64 absolute-sample bookkeeping that pseudoranges need
(tracking.sci:343-345).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import code_tables
from gnsstpu.tracking import scan as tscan


@dataclasses.dataclass
class ChannelInit:
    """Acquisition handoff for one channel (preRun.sci equivalent)."""

    prn: int
    code_phase: int      # samples, 0-based offset of code start in the stream
    doppler_hz: float    # acquired carrier frequency minus this channel's IF
    # FDMA carrier offset from sig.if_freq [Hz] (0 for CDMA; GLONASS:
    # k * L1_IF_step, reference GLONASS/L1/initSettings.sci).
    if_offset_hz: float = 0.0


@dataclasses.dataclass
class TrackResults:
    """Struct-of-arrays tracking record, [C, n_ms] (tracking.sci:43-83)."""

    prn: np.ndarray            # [C] int
    status: np.ndarray         # [C] bool (tracked)
    i_e: np.ndarray
    q_e: np.ndarray
    i_p: np.ndarray
    q_p: np.ndarray
    i_l: np.ndarray
    q_l: np.ndarray
    carr_freq: np.ndarray      # absolute [Hz]
    code_freq: np.ndarray      # absolute [Hz]
    abs_sample: np.ndarray     # f64 absolute sample of code start per ms
    dll_disc: np.ndarray
    dll_disc_filt: np.ndarray
    pll_disc: np.ndarray
    pll_disc_filt: np.ndarray


def resolve_engine(code_mode: str = "auto") -> str:
    """Resolve the tracking engine: "auto" is the fused Pallas kernel on a
    TPU backend (the production engine, ops.track_kernel) and the exact
    XLA scan engine elsewhere (portable oracle)."""
    if code_mode != "auto":
        return code_mode
    return "fused" if jax.default_backend() == "tpu" else "gather"


def track(source, channels: Sequence[ChannelInit], sig: SignalConfig,
          trk: TrackConfig, n_ms: int, chunk_ms: int = 256,
          code_mode: str = "auto") -> TrackResults:
    """Track all channels for n_ms code periods.

    source: SampleSource (see gnsstpu.runtime.sources).
    code_mode: "auto" (fused on TPU, gather elsewhere), "fused" (Pallas
    production kernel), "gather" (exact oracle), or "table" (XLA scan with
    phase-row tables) — see tracking.scan.make_tracker / tracking.fused.
    """
    code_mode = resolve_engine(code_mode)
    C = len(channels)
    spc = sig.samples_per_code
    # Chunk margin: initial code-phase spread (one code period) plus
    # worst-case differential code-Doppler drift over the whole run.
    drift = int(np.ceil(n_ms * 1e-3 * 2e-5 * sig.fs)) + 64
    chunk_len = chunk_ms * spc + spc + drift + 2

    if code_mode == "fused":
        from gnsstpu.tracking.fused import (fused_code_table,
                                            make_fused_tracker)
        codes_dev = jnp.asarray(fused_code_table(
            sig, trk, [ch.prn for ch in channels]))
    elif code_mode == "table":
        tab = code_tables.phase_row_table(
            sig.signal, sig.fs, sig.code_freq, sig.code_length, spc + 2)
        codes_dev = jnp.asarray(
            np.stack([tab[ch.prn - 1] for ch in channels]))
    else:
        padded = code_tables.padded_code_table(sig.signal)
        codes_dev = jnp.asarray(np.stack(
            [padded[ch.prn - 1] for ch in channels]).astype(np.float32))

    state = tscan.TrackState.init(
        np.array([ch.code_phase for ch in channels], np.int64),
        np.array([ch.doppler_hz for ch in channels], np.float32),
        aid_div=trk.aid_div,
    )
    carr_base, inv_aid = tscan.channel_consts(
        sig, trk, [ch.prn for ch in channels],
        if_offsets_hz=[ch.if_offset_hz for ch in channels])
    consts = (jnp.asarray(carr_base), jnp.asarray(inv_aid))

    if code_mode == "fused":
        tracker = make_fused_tracker(sig, trk, n_blocks=chunk_ms)
    else:
        tracker = tscan.make_tracker(sig, trk, n_blocks=chunk_ms,
                                     code_mode=code_mode)

    n_chunks = int(np.ceil(n_ms / chunk_ms))
    outs = []
    abs_pos = np.array([ch.code_phase for ch in channels], np.float64)
    abs_samples = np.zeros((C, 0))
    for _ in range(n_chunks):
        # Rebase each chunk at the slowest channel so per-channel offsets
        # stay bounded by (one code period + differential drift).
        s0 = int(abs_pos.min())
        chunk = jnp.asarray(source.read(s0, chunk_len))
        rel = np.round(abs_pos - s0).astype(np.int64)
        state = state._replace(
            corr=state.corr._replace(
                sample_pos=jnp.asarray(rel, jnp.int32)))
        state, out = tracker(chunk, codes_dev, consts, state)
        out = jax.tree.map(np.asarray, out)
        outs.append(out)
        # f64 absolute-sample bookkeeping from per-block sizes.
        blk = out.blksize.astype(np.float64)          # [n_blocks, C]
        ends = s0 + rel[None, :] + np.cumsum(blk, axis=0)
        abs_samples = np.concatenate([abs_samples, ends.T], axis=1)
        abs_pos = ends[-1]

    def cat(field):
        return np.concatenate([getattr(o, field) for o in outs],
                              axis=0).T[:, :n_ms]

    rem = cat("rem_code_phase").astype(np.float64)
    # absoluteSample: stream position after the block minus the code-phase
    # remainder in samples (tracking.sci:343-345).
    abs_sample = abs_samples[:, :n_ms] - rem * (sig.fs / 1e3) / sig.code_length

    return TrackResults(
        prn=np.array([ch.prn for ch in channels]),
        status=np.ones(C, bool),
        i_e=cat("ie"), q_e=cat("qe"), i_p=cat("ip"), q_p=cat("qp"),
        i_l=cat("il"), q_l=cat("ql"),
        carr_freq=(sig.if_freq
                   + np.array([ch.if_offset_hz for ch in channels]
                              )[:, None]
                   + cat("carr_doppler").astype(np.float64)),
        code_freq=sig.code_freq + cat("code_freq_delta").astype(np.float64),
        abs_sample=abs_sample,
        dll_disc=cat("dll_disc"),
        dll_disc_filt=cat("dll_disc_filt"),
        pll_disc=cat("pll_disc"),
        pll_disc_filt=cat("pll_disc_filt"),
    )
