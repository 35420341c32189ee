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
               trk: TrackConfig, n_ms: int, chunk_ms: int = 256,
               code_mode: str = "auto") -> DualTrackResults:
    """Chunked host driver for GLONASS L3OC data+pilot tracking.

    channels[].prn is the satellite number 1..31; the pilot code is
    code(prn) and the data code is code(prn + 32) (signals.glonass_l3).
    code_mode: "auto" = the fused Pallas dual kernel on TPU backends
    (production), exact gather scan elsewhere; or "fused"/"gather".
    """
    from gnsstpu.signals import glonass_l3
    from gnsstpu.tracking.driver import resolve_engine

    code_mode = resolve_engine(code_mode)
    C = len(channels)
    spc = sig.samples_per_code
    drift = int(np.ceil(n_ms * 1e-3 * 2e-5 * sig.fs)) + 64
    chunk_len = chunk_ms * spc + spc + drift + 2

    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    if code_mode == "fused":
        tab = jnp.asarray(dual_fused_table(
            sig, trk, [ch.prn for ch in channels]))
    else:
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

    if code_mode == "fused":
        fused = make_fused_dual_tracker(sig, trk, n_blocks=chunk_ms)

        def tracker(chunk, _p, _d, cb, st):
            return fused(chunk, tab, cb, st)
    else:
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
        state, out = tracker(chunk,
                             None if code_mode == "fused" else pilot,
                             None if code_mode == "fused" else data,
                             carr_base, state)
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


# ---------------------------------------------------------------------------
# Fused Pallas dual-code engine (production L3 path): HBM tap-row table +
# per-block row DMA (ops.track_kernel.track_chunk_dual_fused).
# ---------------------------------------------------------------------------


def dual_fused_span(sig: SignalConfig, phases_per_chip: int = 64) -> float:
    """Table half-span in chips: covers |rem| (< one code step/sample)
    plus rounding margin; E/L spacing is baked into the tap planes, so
    it does NOT widen the span."""
    step = float(sig.code_freq) / float(sig.fs)
    need = step + 2.0 / phases_per_chip + 0.0625
    return float(np.ceil(need * 8.0) / 8.0)


def dual_fused_table(sig: SignalConfig, trk: TrackConfig, prns,
                     phases_per_chip: int = 64) -> np.ndarray:
    """Tap-row table for the fused dual kernel, f32 [C, R, 8, blkp].

    Row p, plane j = the j-th tap waveform point-sampled at the nominal
    chip rate from chip phase (-span + p/ph + off_j), circularly; planes
    are (pilot, data) x (E, P, L) with off = (-spacing, 0, +spacing)
    (DualBlockOut accumulator order). Lives in HBM; the kernel DMAs one
    [8, blkp] row (planes padded to the sublane tile) per channel per
    block.
    """
    from gnsstpu.signals import glonass_l3

    blkp = sig.samples_per_code + 2
    ph = phases_per_chip
    span = dual_fused_span(sig, ph)
    rows = int(round(2 * span * ph))
    s = float(sig.code_freq) / float(sig.fs)
    sp = float(trk.el_spacing)
    k = np.arange(blkp, dtype=np.float64)
    p = np.arange(rows, dtype=np.float64)
    # 8 tap planes: 6 used + 2 zero pad, lanes padded to the 128 tile
    # (HBM DMA slices must be tile-aligned in both trailing dims).
    bp = -(-blkp // 128) * 128
    out = np.zeros((len(prns), rows, 8, bp), np.float32)
    for i, prn in enumerate(prns):
        pilot = glonass_l3.generate_l3_code(glonass_l3.pilot_prn(prn))
        data = glonass_l3.generate_l3_code(glonass_l3.data_prn(prn))
        for j, (code, off) in enumerate(
                [(pilot, -sp), (pilot, 0.0), (pilot, sp),
                 (data, -sp), (data, 0.0), (data, sp)]):
            idx = np.floor(-span + off + p[:, None] / ph
                           + k[None, :] * s).astype(np.int64)
            out[i, :, j, :blkp] = code[idx % sig.code_length]
    return out


def make_fused_dual_tracker(sig: SignalConfig, trk: TrackConfig, *,
                            n_blocks: int, phases_per_chip: int = 64,
                            ct: int = 8, interpret: bool = False):
    """Fused-kernel dual tracker with the scan engine's pytrees:
    track_chunk(chunk [N,2], tab [C,R,6,blkp], carr_base_u32 [C],
                state: TrackState) -> (state, DualTrackOut)."""
    from gnsstpu.ops import track_kernel as tk
    from gnsstpu.ops.dualcode import DualBlockOut

    spc = sig.samples_per_code
    blkp = spc + 2
    pdi = sig.code_period_s
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw, pdi)
    coefs = (float(k1), float(k2), float(k3),
             float(tau2 / tau1), float(pdi / tau1))
    base_code_step = float(np.float64(sig.code_freq) / sig.fs)
    span = dual_fused_span(sig, phases_per_chip)

    @jax.jit
    def track_chunk(chunk, tab, carr_base_u32, state: TrackState):
        C = carr_base_u32.shape[0]
        inv_aid = jnp.full((C,), 1.0 / trk.aid_div, jnp.float32)
        finit = jnp.stack([
            state.corr.rem_code_phase, state.corr.code_delta,
            state.corr.carr_delta, state.carr_nco, state.old_carr_err,
            state.code_nco, state.old_code_err, state.ip_prev,
            state.qp_prev, state.doppler_basis, inv_aid], axis=1)
        finit = jnp.pad(finit, ((0, 0), (0, tk.NF - finit.shape[1])))
        chunk_t = jnp.pad(chunk.T, ((0, 0), (0, 256)))
        out, ffin, posfin, cfin = tk.track_chunk_dual_fused(
            chunk_t, tab, state.corr.sample_pos, finit,
            state.corr.carr_phase_u32,
            carr_base_u32.astype(jnp.uint32)[:, None],
            n_blocks=n_blocks, blkp=blkp, code_length=sig.code_length,
            phases_per_chip=phases_per_chip, span_chips=span,
            base_code_step=base_code_step, fs=float(sig.fs),
            coefs=coefs, ct=ct, interpret=interpret)
        new_state = TrackState(
            corr=state.corr._replace(
                rem_code_phase=ffin[:, tk._F_REM],
                carr_phase_u32=cfin,
                sample_pos=posfin,
                code_delta=ffin[:, tk._F_CODE_DELTA],
                carr_delta=ffin[:, tk._F_CARR_DELTA]),
            doppler_basis=state.doppler_basis,
            carr_nco=ffin[:, tk._F_CARR_NCO],
            old_carr_err=ffin[:, tk._F_OLD_CARR_ERR],
            code_nco=ffin[:, tk._F_CODE_NCO],
            old_code_err=ffin[:, tk._F_OLD_CODE_ERR],
            ip_prev=ffin[:, tk._F_IP_PREV],
            qp_prev=ffin[:, tk._F_QP_PREV])
        acc = DualBlockOut(
            ie=out[:, :, tk.OD_IE], qe=out[:, :, tk.OD_QE],
            ip=out[:, :, tk.OD_IP], qp=out[:, :, tk.OD_QP],
            il=out[:, :, tk.OD_IL], ql=out[:, :, tk.OD_QL],
            ie2=out[:, :, tk.OD_IE2], qe2=out[:, :, tk.OD_QE2],
            ip2=out[:, :, tk.OD_IP2], qp2=out[:, :, tk.OD_QP2],
            il2=out[:, :, tk.OD_IL2], ql2=out[:, :, tk.OD_QL2],
            blksize=out[:, :, tk.OD_BLKSIZE].astype(jnp.int32),
            rem_code_phase=out[:, :, tk.OD_REM])
        tout = DualTrackOut(
            acc=acc,
            carr_doppler=out[:, :, tk.OD_CARR_DOPPLER],
            code_freq_delta=out[:, :, tk.OD_CODE_FREQ_DELTA],
            dll_disc=out[:, :, tk.OD_DLL_DISC],
            pll_disc=out[:, :, tk.OD_PLL_DISC])
        return new_state, tout

    return track_chunk
