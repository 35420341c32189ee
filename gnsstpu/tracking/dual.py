"""Data+pilot dual-component tracking (GLONASS L3OC).

Same scan/vmap structure as gnsstpu.tracking.scan, running the dual-code
block op (gnsstpu.ops.dualcode): 12 accumulators per code period. Loop
wiring follows the reference L3 tracker (GLONASS/L3/tracking.sci:355-396)
with one deliberate improvement, flagged below:

  * PLL: Costas atan(Q_P/I_P) on the *pilot* prompt (tracking.sci:366 uses
    I_P/Q_P of the pilot code) — invariant to the NH(10) overlay flips;
  * FLL assist: cross/dot over consecutive pilot prompts in the
    flip-invariant 2-quadrant form (the reference forms it from the data
    prompts, tracking.sci:355-361, which is sign-flipped by the
    Barker x data overlay; the 2-quadrant form is immune either way);
  * DLL: normalized E-L envelopes on the *pilot* (the reference uses the
    data component, tracking.sci:378-383; envelopes are flip-invariant so
    both work — the pilot is chosen here because its overlay is known and
    periodic, so it can also run overlay-wiped in future);
  * code clock carrier-aided by (carrFreq - IF) / 117.5
    (= 1202.025 MHz / 10.23 Mcps, tracking.sci:390-392).

The data-component prompt stream (ip2/qp2) is the demodulation observable:
nav.glonass_l3 wipes the Barker(5) overlay and Viterbi-decodes the 200 sps
symbols.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import nco
from gnsstpu.ops.correlate import CorrState
from gnsstpu.ops.dualcode import DualBlockOut, correlate_block_dual
from gnsstpu.tracking import loop_filters
from gnsstpu.tracking.driver import ChannelInit
from gnsstpu.tracking.scan import TrackState


class DualTrackOut(NamedTuple):
    acc: DualBlockOut
    carr_doppler: jax.Array
    code_freq_delta: jax.Array
    dll_disc: jax.Array
    pll_disc: jax.Array


def make_dual_tracker(sig: SignalConfig, trk: TrackConfig, *,
                      n_blocks: int, blkmax: int | None = None):
    """Build the jitted dual-component chunk tracker.

    track_chunk(chunk[N,2], codes ([C,L+2] pilot, [C,L+2] data),
                carr_base_u32[C], state: TrackState[C])
      -> (new_state, DualTrackOut [n_blocks, C])
    """
    spc = sig.samples_per_code
    blkmax = blkmax or (spc + 2)
    pdi = sig.code_period_s
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw, pdi)
    f32 = jnp.float32
    c_dll_p, c_dll_i = f32(tau2 / tau1), f32(pdi / tau1)
    k1, k2, k3 = f32(k1), f32(k2), f32(k3)
    inv_aid = f32(1.0 / trk.aid_div)

    corr = functools.partial(
        correlate_block_dual,
        blkmax=blkmax,
        spacing=trk.el_spacing,
        code_length=sig.code_length,
        base_code_step=float(np.float64(sig.code_freq) / sig.fs),
        inv_fs=1.0 / sig.fs,
    )

    def one_block(chunk, pilot_code, data_code, carr_base_u32,
                  st: TrackState):
        out, cs = corr(chunk, pilot_code, data_code, carr_base_u32, st.corr)

        i1, q1 = out.ip, out.qp
        cross = i1 * st.qp_prev - st.ip_prev * q1
        dot = i1 * st.ip_prev + q1 * st.qp_prev
        # NH overlay flips between consecutive 1 ms prompts -> 2-quadrant.
        freq_err = (jnp.arctan2(cross * jnp.sign(dot), jnp.abs(dot))
                    * f32(1.0 / np.pi))
        denom = jnp.where(jnp.abs(i1) < 1e-10, f32(1e-10), i1)
        carr_err = jnp.arctan(q1 / denom) * f32(1.0 / (2.0 * np.pi))
        carr_nco = (st.carr_nco + k1 * carr_err - k2 * st.old_carr_err
                    - k3 * freq_err)
        carr_delta = st.doppler_basis + carr_nco

        e = jnp.sqrt(out.ie * out.ie + out.qe * out.qe)
        l = jnp.sqrt(out.il * out.il + out.ql * out.ql)
        code_err = (e - l) / jnp.maximum(e + l, f32(1e-10))
        code_nco = (st.code_nco + c_dll_p * (code_err - st.old_code_err)
                    + code_err * c_dll_i)
        code_delta = -code_nco + carr_delta * inv_aid

        new_state = TrackState(
            corr=cs._replace(code_delta=code_delta, carr_delta=carr_delta),
            doppler_basis=st.doppler_basis,
            carr_nco=carr_nco, old_carr_err=carr_err,
            code_nco=code_nco, old_code_err=code_err,
            ip_prev=i1, qp_prev=q1,
        )
        tout = DualTrackOut(
            acc=out, carr_doppler=carr_delta, code_freq_delta=code_delta,
            dll_disc=code_err, pll_disc=carr_err,
        )
        return new_state, tout

    vblock = jax.vmap(one_block, in_axes=(None, 0, 0, 0, 0))

    @jax.jit
    def track_chunk(chunk, pilot_codes, data_codes, carr_base_u32, state):
        def step(st, _):
            return vblock(chunk, pilot_codes, data_codes, carr_base_u32, st)

        return jax.lax.scan(step, state, None, length=n_blocks)

    return track_chunk


@dataclasses.dataclass
class DualTrackResults:
    """[C, n_blocks] arrays at the 1 ms code-period cadence."""

    prn: np.ndarray
    i_p: np.ndarray
    q_p: np.ndarray
    i_e: np.ndarray
    q_e: np.ndarray
    i_l: np.ndarray
    q_l: np.ndarray
    i_p2: np.ndarray
    q_p2: np.ndarray
    carr_freq: np.ndarray
    code_freq: np.ndarray
    abs_sample: np.ndarray
    dll_disc: np.ndarray
    pll_disc: np.ndarray


def track_dual(source, channels: Sequence[ChannelInit], sig: SignalConfig,
               trk: TrackConfig, n_ms: int, chunk_ms: int = 256
               ) -> DualTrackResults:
    """Chunked host driver for GLONASS L3OC data+pilot tracking.

    channels[].prn is the satellite number 1..31; the pilot code is
    code(prn) and the data code is code(prn + 32) (signals.glonass_l3).
    """
    from gnsstpu.signals import glonass_l3

    C = len(channels)
    spc = sig.samples_per_code
    drift = int(np.ceil(n_ms * 1e-3 * 2e-5 * sig.fs)) + 64
    chunk_len = chunk_ms * spc + spc + drift + 2

    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    pilot = jnp.asarray(np.stack(
        [pad(glonass_l3.generate_l3_code(glonass_l3.pilot_prn(ch.prn)))
         for ch in channels]))
    data = jnp.asarray(np.stack(
        [pad(glonass_l3.generate_l3_code(glonass_l3.data_prn(ch.prn)))
         for ch in channels]))

    state = TrackState.init(
        np.array([ch.code_phase for ch in channels], np.int64),
        np.array([ch.doppler_hz for ch in channels], np.float32),
        aid_div=trk.aid_div,
    )
    carr_base = jnp.asarray(np.array(
        [nco.freq_to_step_u32(sig.if_freq + ch.if_offset_hz, sig.fs)
         for ch in channels], np.uint32))

    tracker = make_dual_tracker(sig, trk, n_blocks=chunk_ms)

    n_chunks = int(np.ceil(n_ms / chunk_ms))
    outs = []
    abs_pos = np.array([ch.code_phase for ch in channels], np.float64)
    abs_samples = np.zeros((C, 0))
    for _ in range(n_chunks):
        s0 = int(abs_pos.min())
        chunk = jnp.asarray(source.read(s0, chunk_len))
        rel = np.round(abs_pos - s0).astype(np.int64)
        state = state._replace(corr=state.corr._replace(
            sample_pos=jnp.asarray(rel, jnp.int32)))
        state, out = tracker(chunk, pilot, data, carr_base, state)
        out = jax.tree.map(np.asarray, out)
        outs.append(out)
        blk = out.acc.blksize.astype(np.float64)
        ends = s0 + rel[None, :] + np.cumsum(blk, axis=0)
        abs_samples = np.concatenate([abs_samples, ends.T], axis=1)
        abs_pos = ends[-1]

    def cat(path):
        return np.concatenate([path(o) for o in outs], axis=0).T[:, :n_ms]

    rem = cat(lambda o: o.acc.rem_code_phase).astype(np.float64)
    abs_sample = (abs_samples[:, :n_ms]
                  - rem * (sig.fs / sig.code_freq))

    return DualTrackResults(
        prn=np.array([ch.prn for ch in channels]),
        i_p=cat(lambda o: o.acc.ip), q_p=cat(lambda o: o.acc.qp),
        i_e=cat(lambda o: o.acc.ie), q_e=cat(lambda o: o.acc.qe),
        i_l=cat(lambda o: o.acc.il), q_l=cat(lambda o: o.acc.ql),
        i_p2=cat(lambda o: o.acc.ip2), q_p2=cat(lambda o: o.acc.qp2),
        carr_freq=sig.if_freq + cat(
            lambda o: o.carr_doppler).astype(np.float64),
        code_freq=sig.code_freq + cat(
            lambda o: o.code_freq_delta).astype(np.float64),
        abs_sample=abs_sample,
        dll_disc=cat(lambda o: o.dll_disc),
        pll_disc=cat(lambda o: o.pll_disc),
    )
