"""Double-estimator BOC tracking (Galileo E1): DLL + SLL + FLL-assisted PLL.

Device engine with the same scan/vmap structure as gnsstpu.tracking.scan,
but running the ten-correlator BOC block op (gnsstpu.ops.boc) and a third
loop: the subcarrier lock loop. Filter structure and aiding follow the
reference double-estimator (GALILEO/E1/tracking.sci:300-430):
  * PLL/FLL on P_P (same FLL-assisted PLL as GPS),
  * DLL on normalized (|P_E| - |P_L|) envelopes, code clock aided by
    (carrFreq - IF)/1540,
  * SLL on normalized (|E_P| - |L_P|) envelopes, meandr clock aided by
    (carrFreq - IF)/770.
The unambiguous pseudorange observable is the code estimator; the meandr
estimator supplies the precise (but half-cycle-ambiguous) delay, exactly
the double-estimator split the reference implements.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import nco
from gnsstpu.ops.boc import BocBlockOut, BocCorrState, correlate_block_boc
from gnsstpu.tracking import loop_filters
from gnsstpu.tracking.driver import ChannelInit


class BocTrackState(NamedTuple):
    corr: BocCorrState
    doppler_basis: jax.Array
    carr_nco: jax.Array
    old_carr_err: jax.Array
    code_nco: jax.Array
    old_code_err: jax.Array
    sll_nco: jax.Array
    old_sll_err: jax.Array
    ip_prev: jax.Array
    qp_prev: jax.Array

    @staticmethod
    def init(code_phase_samples, doppler_hz, aid_code: float = 1540.0,
             aid_sub: float = 770.0):
        cp = jnp.asarray(code_phase_samples, jnp.int32)
        dp = jnp.asarray(doppler_hz, jnp.float32)
        z = jnp.zeros_like(dp)
        eps = jnp.full_like(dp, 1e-3)
        return BocTrackState(
            corr=BocCorrState(
                rem_code_phase=z,
                rem_sub_phase=z,
                carr_phase_u32=jnp.zeros_like(cp, dtype=jnp.uint32),
                sample_pos=cp,
                code_delta=dp / jnp.float32(aid_code),
                sub_delta=dp / jnp.float32(aid_sub),
                carr_delta=dp,
            ),
            doppler_basis=dp, carr_nco=z, old_carr_err=z,
            code_nco=z, old_code_err=z, sll_nco=z, old_sll_err=z,
            ip_prev=eps, qp_prev=eps,
        )


class BocTrackOut(NamedTuple):
    acc: BocBlockOut
    carr_doppler: jax.Array
    code_freq_delta: jax.Array
    sub_freq_delta: jax.Array
    dll_disc: jax.Array
    sll_disc: jax.Array
    pll_disc: jax.Array


def make_boc_tracker(sig: SignalConfig, trk: TrackConfig, *, n_blocks: int,
                     blkmax: int | None = None):
    """sig follows the registry convention for 'galileo_e1b': code_freq /
    code_length describe the composite at the meandr (half-chip) rate;
    the primary code is half that. One block = one 4 ms code period, so
    loop pdi = 4 ms (the reference tracks 1 ms quarter-code segments;
    the full-period block is the TPU-friendly equivalent — wider matmuls,
    same loop structure with pdi scaled in the coefficients)."""
    sub_len = sig.code_length
    code_len = sub_len // 2
    sub_freq = sig.code_freq
    code_freq = sub_freq / 2.0
    spc = sig.samples_per_code
    blkmax = blkmax or (spc + 2)
    pdi = sig.code_period_s

    tau1c, tau2c = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    tau1s, tau2s = loop_filters.dll_coeffs(trk.sll_bw, trk.sll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw, pdi)
    f32 = jnp.float32
    c_dll_p, c_dll_i = f32(tau2c / tau1c), f32(pdi / tau1c)
    c_sll_p, c_sll_i = f32(tau2s / tau1s), f32(pdi / tau1s)
    k1, k2, k3 = f32(k1), f32(k2), f32(k3)
    # trk.aid_div = f_carrier / f_code(primary) = 1540 for E1
    # (tracking.sci:396); the meandr clock is 2x the code clock -> /770
    # (tracking.sci:417).
    inv_aid_code = f32(1.0 / trk.aid_div)
    inv_aid_sub = f32(2.0 / trk.aid_div)

    import functools
    corr = functools.partial(
        correlate_block_boc,
        blkmax=blkmax,
        code_spacing=trk.el_spacing,
        sub_spacing=trk.sll_spacing,
        code_length=code_len,
        sub_length=sub_len,
        base_code_step=float(np.float64(code_freq) / sig.fs),
        base_sub_step=float(np.float64(sub_freq) / sig.fs),
        inv_fs=1.0 / sig.fs,
    )

    def one_block(chunk, padded_code, padded_sub, carr_base_u32,
                  st: BocTrackState):
        out, cs = corr(chunk, padded_code, padded_sub, carr_base_u32,
                       st.corr)
        i1, q1 = out.i_pp, out.q_pp
        cross = i1 * st.qp_prev - st.ip_prev * q1
        dot = i1 * st.ip_prev + q1 * st.qp_prev
        # 250 sps I/NAV symbols flip sign every block -> flip-invariant
        # 2-quadrant FLL (see tracking.scan one_block notes).
        freq_err = (jnp.arctan2(cross * jnp.sign(dot), jnp.abs(dot))
                    * f32(1.0 / np.pi))
        denom = jnp.where(jnp.abs(i1) < 1e-10, f32(1e-10), i1)
        carr_err = jnp.arctan(q1 / denom) * f32(1.0 / (2.0 * np.pi))
        carr_nco = (st.carr_nco + k1 * carr_err - k2 * st.old_carr_err
                    - k3 * freq_err)
        carr_delta = st.doppler_basis + carr_nco

        # DLL on meandr-prompt taps (tracking.sci:382-396).
        e = jnp.sqrt(out.i_pe ** 2 + out.q_pe ** 2)
        l = jnp.sqrt(out.i_pl ** 2 + out.q_pl ** 2)
        code_err = (e - l) / jnp.maximum(e + l, f32(1e-10))
        code_nco = (st.code_nco + c_dll_p * (code_err - st.old_code_err)
                    + code_err * c_dll_i)
        code_delta = -code_nco + carr_delta * inv_aid_code

        # SLL on code-prompt taps (tracking.sci:399-417).
        se = jnp.sqrt(out.i_ep ** 2 + out.q_ep ** 2)
        sl = jnp.sqrt(out.i_lp ** 2 + out.q_lp ** 2)
        sll_err = (se - sl) / jnp.maximum(se + sl, f32(1e-10))
        sll_nco = (st.sll_nco + c_sll_p * (sll_err - st.old_sll_err)
                   + sll_err * c_sll_i)
        sub_delta = -sll_nco + carr_delta * inv_aid_sub

        new_state = BocTrackState(
            corr=cs._replace(code_delta=code_delta, sub_delta=sub_delta,
                             carr_delta=carr_delta),
            doppler_basis=st.doppler_basis,
            carr_nco=carr_nco, old_carr_err=carr_err,
            code_nco=code_nco, old_code_err=code_err,
            sll_nco=sll_nco, old_sll_err=sll_err,
            ip_prev=i1, qp_prev=q1,
        )
        tout = BocTrackOut(
            acc=out, carr_doppler=carr_delta, code_freq_delta=code_delta,
            sub_freq_delta=sub_delta, dll_disc=code_err, sll_disc=sll_err,
            pll_disc=carr_err,
        )
        return new_state, tout

    vblock = jax.vmap(one_block, in_axes=(None, 0, None, 0, 0))

    @jax.jit
    def track_chunk(chunk, padded_codes, padded_sub, carr_base_u32, state):
        def step(st, _):
            return vblock(chunk, padded_codes, padded_sub, carr_base_u32, st)

        return jax.lax.scan(step, state, None, length=n_blocks)

    return track_chunk


@dataclasses.dataclass
class BocTrackResults:
    """[C, n_blocks] arrays at the code-period (4 ms) cadence."""

    prn: np.ndarray
    i_pp: np.ndarray
    q_pp: np.ndarray
    i_pe: np.ndarray
    q_pe: np.ndarray
    i_pl: np.ndarray
    q_pl: np.ndarray
    i_ep: np.ndarray
    q_ep: np.ndarray
    i_lp: np.ndarray
    q_lp: np.ndarray
    carr_freq: np.ndarray
    code_freq: np.ndarray
    sub_freq: np.ndarray
    abs_sample: np.ndarray
    dll_disc: np.ndarray
    sll_disc: np.ndarray
    pll_disc: np.ndarray


def track_boc(source, channels: Sequence[ChannelInit], sig: SignalConfig,
              trk: TrackConfig, n_blocks: int, chunk_blocks: int = 128,
              code_mode: str = "auto") -> BocTrackResults:
    """Chunked host driver around the BOC engines (Galileo E1B).

    code_mode: "auto" = the fused Pallas double-estimator kernel on TPU
    backends (production), exact gather scan elsewhere."""
    from gnsstpu.signals import galileo_e1
    from gnsstpu.tracking.driver import resolve_engine

    code_mode = resolve_engine(code_mode)

    C = len(channels)
    spc = sig.samples_per_code
    code_len = sig.code_length // 2
    drift = int(np.ceil(n_blocks * sig.code_period_s * 2e-5 * sig.fs)) + 64
    chunk_len = chunk_blocks * spc + spc + drift + 2

    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    codes = jnp.asarray(np.stack(
        [pad(galileo_e1.primary_code(ch.prn)) for ch in channels]))
    sub = jnp.asarray(pad(galileo_e1.subcarrier()))

    state = BocTrackState.init(
        np.array([ch.code_phase for ch in channels], np.int64),
        np.array([ch.doppler_hz for ch in channels], np.float32))
    carr_base = jnp.asarray(np.array(
        [nco.freq_to_step_u32(sig.if_freq + ch.if_offset_hz, sig.fs)
         for ch in channels], np.uint32))

    if code_mode == "fused":
        ctab, stab, _, _ = boc_fused_tables(
            sig, trk, [ch.prn for ch in channels])
        ctab, stab = jnp.asarray(ctab), jnp.asarray(stab)
        ftracker = make_fused_boc_tracker(sig, trk, n_blocks=chunk_blocks)

        def tracker(chunk, _codes, _sub, cb, st):
            return ftracker(chunk, ctab, stab, cb, st)
    else:
        tracker = make_boc_tracker(sig, trk, n_blocks=chunk_blocks)

    n_chunks = int(np.ceil(n_blocks / chunk_blocks))
    outs = []
    abs_pos = np.array([ch.code_phase for ch in channels], np.float64)
    abs_samples = np.zeros((C, 0))
    for _ in range(n_chunks):
        s0 = int(abs_pos.min())
        chunk = jnp.asarray(source.read(s0, chunk_len))
        rel = np.round(abs_pos - s0).astype(np.int64)
        state = state._replace(corr=state.corr._replace(
            sample_pos=jnp.asarray(rel, jnp.int32)))
        state, out = tracker(chunk, codes, sub, carr_base, state)
        out = jax.tree.map(np.asarray, out)
        outs.append(out)
        blk = out.acc.blksize.astype(np.float64)
        ends = s0 + rel[None, :] + np.cumsum(blk, axis=0)
        abs_samples = np.concatenate([abs_samples, ends.T], axis=1)
        abs_pos = ends[-1]

    def cat(path):
        return np.concatenate([path(o) for o in outs], axis=0).T[:, :n_blocks]

    rem = cat(lambda o: o.acc.rem_code_phase).astype(np.float64)
    abs_sample = (abs_samples[:, :n_blocks]
                  - rem * (sig.fs / (sig.code_freq / 2.0)))

    return BocTrackResults(
        prn=np.array([ch.prn for ch in channels]),
        i_pp=cat(lambda o: o.acc.i_pp), q_pp=cat(lambda o: o.acc.q_pp),
        i_pe=cat(lambda o: o.acc.i_pe), q_pe=cat(lambda o: o.acc.q_pe),
        i_pl=cat(lambda o: o.acc.i_pl), q_pl=cat(lambda o: o.acc.q_pl),
        i_ep=cat(lambda o: o.acc.i_ep), q_ep=cat(lambda o: o.acc.q_ep),
        i_lp=cat(lambda o: o.acc.i_lp), q_lp=cat(lambda o: o.acc.q_lp),
        carr_freq=sig.if_freq + cat(lambda o: o.carr_doppler).astype(
            np.float64),
        code_freq=sig.code_freq / 2.0 + cat(
            lambda o: o.code_freq_delta).astype(np.float64),
        sub_freq=sig.code_freq + cat(lambda o: o.sub_freq_delta).astype(
            np.float64),
        abs_sample=abs_sample,
        dll_disc=cat(lambda o: o.dll_disc),
        sll_disc=cat(lambda o: o.sll_disc),
        pll_disc=cat(lambda o: o.pll_disc),
    )


# ---------------------------------------------------------------------------
# Fused Pallas BOC engine (production E1 path): per-channel primary-code
# tap table + shared meandr tap table in HBM, one row DMA of each per
# channel per block (ops.track_kernel.track_chunk_boc_fused).
# ---------------------------------------------------------------------------


def _boc_spans(sig: SignalConfig, ph: int):
    """(span_code, span_sub) in their own clock units. The code
    estimator's remainder stays within one code step per sample; the sub
    estimator's remainder additionally carries the DOUBLE-ESTIMATOR
    offset — the SLL measures the subcarrier delay independently and may
    sit up to ~half a half-chip away from 2x the code delay — so its
    span includes that excursion."""
    step_c = float(sig.code_freq / 2.0) / float(sig.fs)
    step_s = float(sig.code_freq) / float(sig.fs)
    span_c = float(np.ceil((step_c + 2.0 / ph + 0.0625) * 8.0) / 8.0)
    span_s = float(np.ceil((step_s + 0.625 + 2.0 / ph + 0.0625)
                           * 8.0) / 8.0)
    return span_c, span_s


def _tap_table(codes, length: int, fs: float, freq: float, blkp: int,
               spacing: float, ph: int, span: float):
    """Generic tap-row table: [N, R, 8, BP] f32 with E/P/L planes at
    (-spacing, 0, +spacing) units of the given clock."""
    step = float(freq) / float(fs)
    rows = int(round(2 * span * ph))
    bp = -(-blkp // 128) * 128
    k = np.arange(blkp, dtype=np.float64)
    p = np.arange(rows, dtype=np.float64)
    out = np.zeros((len(codes), rows, 8, bp), np.float32)
    for i, code in enumerate(codes):
        for j, off in enumerate((-spacing, 0.0, spacing)):
            idx = np.floor(-span + off + p[:, None] / ph
                           + k[None, :] * step).astype(np.int64)
            out[i, :, j, :blkp] = code[idx % length]
    return out


def boc_fused_tables(sig: SignalConfig, trk: TrackConfig, prns,
                     ph: int = 64):
    """(code_tab [C, Rc, 8, BP], sub_tab [Rs, 8, BP], span_c, span_s)
    for the fused BOC kernel. sig follows the galileo_e1b registry
    convention (code_freq/code_length at the meandr rate)."""
    from gnsstpu.signals import galileo_e1

    blkp = sig.samples_per_code + 2
    code_len = sig.code_length // 2
    span_c, span_s = _boc_spans(sig, ph)
    ctab = _tap_table(
        [galileo_e1.primary_code(p) for p in prns], code_len,
        sig.fs, sig.code_freq / 2.0, blkp, trk.el_spacing, ph, span_c)
    stab = _tap_table(
        [galileo_e1.subcarrier()], sig.code_length,
        sig.fs, sig.code_freq, blkp, trk.sll_spacing, ph, span_s)
    return ctab, stab[0], span_c, span_s


def make_fused_boc_tracker(sig: SignalConfig, trk: TrackConfig, *,
                           n_blocks: int, ph: int = 64, ct: int = 8,
                           interpret: bool = False):
    """Fused-kernel BOC tracker with the scan engine's pytrees:
    track_chunk(chunk [N,2], ctab, stab, carr_base_u32 [C],
                state: BocTrackState) -> (state, BocTrackOut)."""
    from gnsstpu.ops import track_kernel as tk
    from gnsstpu.ops.boc import BocBlockOut

    sub_len = sig.code_length
    code_len = sub_len // 2
    spc = sig.samples_per_code
    blkp = spc + 2
    pdi = sig.code_period_s
    tau1c, tau2c = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping,
                                           1.0)
    tau1s, tau2s = loop_filters.dll_coeffs(trk.sll_bw, trk.sll_damping,
                                           1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw, pdi)
    coefs = (float(k1), float(k2), float(k3),
             float(tau2c / tau1c), float(pdi / tau1c),
             float(tau2s / tau1s), float(pdi / tau1s))
    base_code_step = float(np.float64(sig.code_freq / 2.0) / sig.fs)
    base_sub_step = float(np.float64(sig.code_freq) / sig.fs)
    span_c, span_s = _boc_spans(sig, ph)

    @jax.jit
    def track_chunk(chunk, ctab, stab, carr_base_u32,
                    state: BocTrackState):
        C = carr_base_u32.shape[0]
        f32 = jnp.float32
        inv_aid = jnp.full((C,), 1.0 / trk.aid_div, f32)
        inv_aid_sub = jnp.full((C,), 2.0 / trk.aid_div, f32)
        zeros = jnp.zeros((C,), f32)
        lanes = [state.corr.rem_code_phase, state.corr.code_delta,
                 state.corr.carr_delta, state.carr_nco,
                 state.old_carr_err, state.code_nco, state.old_code_err,
                 state.ip_prev, state.qp_prev, state.doppler_basis,
                 inv_aid, state.corr.rem_sub_phase, state.corr.sub_delta,
                 state.sll_nco, state.old_sll_err, inv_aid_sub]
        finit = jnp.stack(lanes, axis=1)                 # [C, 16]
        chunk_t = jnp.pad(chunk.T, ((0, 0), (0, 256)))
        out, ffin, posfin, cfin = tk.track_chunk_boc_fused(
            chunk_t, ctab, stab, state.corr.sample_pos, finit,
            state.corr.carr_phase_u32,
            carr_base_u32.astype(jnp.uint32)[:, None],
            n_blocks=n_blocks, blkp=blkp, code_length=code_len,
            sub_length=sub_len, ph_code=ph, ph_sub=ph,
            span_code=span_c, span_sub=span_s,
            base_code_step=base_code_step, base_sub_step=base_sub_step,
            fs=float(sig.fs), coefs=coefs, ct=ct, interpret=interpret)
        new_state = BocTrackState(
            corr=state.corr._replace(
                rem_code_phase=ffin[:, tk._F_REM],
                rem_sub_phase=ffin[:, tk._F_REM_SUB],
                carr_phase_u32=cfin,
                sample_pos=posfin,
                code_delta=ffin[:, tk._F_CODE_DELTA],
                sub_delta=ffin[:, tk._F_SUB_DELTA],
                carr_delta=ffin[:, tk._F_CARR_DELTA]),
            doppler_basis=state.doppler_basis,
            carr_nco=ffin[:, tk._F_CARR_NCO],
            old_carr_err=ffin[:, tk._F_OLD_CARR_ERR],
            code_nco=ffin[:, tk._F_CODE_NCO],
            old_code_err=ffin[:, tk._F_OLD_CODE_ERR],
            sll_nco=ffin[:, tk._F_SLL_NCO],
            old_sll_err=ffin[:, tk._F_OLD_SLL_ERR],
            ip_prev=ffin[:, tk._F_IP_PREV],
            qp_prev=ffin[:, tk._F_QP_PREV])
        acc = BocBlockOut(
            i_ep=out[:, :, tk.OB_IEP], q_ep=out[:, :, tk.OB_QEP],
            i_pe=out[:, :, tk.OB_IPE], q_pe=out[:, :, tk.OB_QPE],
            i_pp=out[:, :, tk.OB_IPP], q_pp=out[:, :, tk.OB_QPP],
            i_pl=out[:, :, tk.OB_IPL], q_pl=out[:, :, tk.OB_QPL],
            i_lp=out[:, :, tk.OB_ILP], q_lp=out[:, :, tk.OB_QLP],
            blksize=out[:, :, tk.OB_BLKSIZE].astype(jnp.int32),
            rem_code_phase=out[:, :, tk.OB_REM],
            rem_sub_phase=out[:, :, tk.OB_REM_SUB])
        tout = BocTrackOut(
            acc=acc,
            carr_doppler=out[:, :, tk.OB_CARR_DOPPLER],
            code_freq_delta=out[:, :, tk.OB_CODE_FREQ_DELTA],
            sub_freq_delta=out[:, :, tk.OB_SUB_FREQ_DELTA],
            dll_disc=out[:, :, tk.OB_DLL_DISC],
            sll_disc=out[:, :, tk.OB_SLL_DISC],
            pll_disc=out[:, :, tk.OB_PLL_DISC])
        return new_state, tout

    return track_chunk
