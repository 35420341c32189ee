"""Device tracking engine: lax.scan over code-period blocks, vmap over channels.

This is the TPU replacement for all four reference tracking loops (Scilab
tracking.sci per-ms loop, osgnss gpsisr state machine's pull-in/track arms,
C++ Channel::DLL/PLL, namuru RTL + ARM firmware): per block it runs the fused
correlator op, then the FLL-assisted-PLL and carrier-aided-DLL updates —
exactly the reference's filter structure (tracking.sci:291-335) — entirely
on device, so a whole chunk (hundreds of ms x all channels) is one XLA
program with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import nco
from gnsstpu.ops.correlate import CorrState, correlate_block
from gnsstpu.tracking import loop_filters


class TrackState(NamedTuple):
    """Full per-channel tracking state (CorrState + loop filter memory)."""

    corr: CorrState
    doppler_basis: jax.Array   # f32, acquired Doppler (carrFreqBasis - IF)
    carr_nco: jax.Array        # f32 accumulated carrier NCO command [Hz]
    old_carr_err: jax.Array    # f32 previous phase error [cycles]
    code_nco: jax.Array        # f32 accumulated code NCO command [Hz]
    old_code_err: jax.Array    # f32 previous code error [dimensionless]
    ip_prev: jax.Array         # f32 previous prompt I (FLL memory)
    qp_prev: jax.Array         # f32 previous prompt Q

    @staticmethod
    def init(code_phase_samples, doppler_hz, aid_div: float = 1540.0):
        """Vectorized init: pass [C] arrays, get a [C]-leaved pytree.

        Unlike the reference (which starts codeFreq at the nominal basis,
        tracking.sci:147), the code NCO starts carrier-aided so the slow DLL
        never sees the initial code-Doppler ramp.
        """
        cp = jnp.asarray(code_phase_samples, jnp.int32)
        dp = jnp.asarray(doppler_hz, jnp.float32)
        z = jnp.zeros_like(dp)
        # Reference seeds the FLL memory with 0.001 (tracking.sci:169).
        eps = jnp.full_like(dp, 1e-3)
        return TrackState(
            corr=CorrState(
                rem_code_phase=z,
                carr_phase_u32=jnp.zeros_like(cp, dtype=jnp.uint32),
                sample_pos=cp,
                code_delta=dp / jnp.float32(aid_div),
                carr_delta=dp,
            ),
            doppler_basis=dp,
            carr_nco=z,
            old_carr_err=z,
            code_nco=z,
            old_code_err=z,
            ip_prev=eps,
            qp_prev=eps,
        )


class TrackOut(NamedTuple):
    """Per-block, per-channel observables (the trackResults record,
    tracking.sci:43-83)."""

    ie: jax.Array
    qe: jax.Array
    ip: jax.Array
    qp: jax.Array
    il: jax.Array
    ql: jax.Array
    carr_doppler: jax.Array    # carrFreq - IF [Hz]
    code_freq_delta: jax.Array  # codeFreq - code basis [Hz]
    rem_code_phase: jax.Array  # chips, after the block
    blksize: jax.Array         # samples consumed
    dll_disc: jax.Array
    dll_disc_filt: jax.Array
    pll_disc: jax.Array
    pll_disc_filt: jax.Array


def channel_consts(sig: SignalConfig, trk: TrackConfig, prns,
                   if_offsets_hz=None):
    """Per-channel constants: exact uint32 carrier NCO base steps and
    carrier-aiding divisors.

    For CDMA signals all channels share sig.if_freq and trk.aid_div; for
    FDMA (GLONASS, reference GLONASS/L1/initSettings.sci L1_IF_step) each
    channel's IF is offset and its aid divisor is f_carr(k)/f_code.
    if_offsets_hz: [C] carrier offsets from sig.if_freq (None = CDMA).
    Returns (carr_base_u32 [C], inv_aid_f32 [C]).
    """
    C = len(prns)
    offs = np.zeros(C) if if_offsets_hz is None else np.asarray(
        if_offsets_hz, np.float64)
    base = np.array(
        [nco.freq_to_step_u32(sig.if_freq + offs[c], sig.fs)
         for c in range(C)], np.uint32)
    inv_aid = np.full(C, 1.0 / trk.aid_div, np.float32)
    if if_offsets_hz is not None:
        # aid_div_k = (f_carr0 + off_k) / f_code with f_carr0 implied by
        # trk.aid_div = f_carr0 / f_code.
        f_carr0 = trk.aid_div * sig.code_freq
        inv_aid = (sig.code_freq / (f_carr0 + offs)).astype(np.float32)
    return base, inv_aid


def make_tracker(sig: SignalConfig, trk: TrackConfig, *, n_blocks: int,
                 blkmax: int | None = None, code_mode: str = "gather"):
    """Build the jitted chunk tracker.

    code_mode: "gather" (exact per-sample code indexing; reference
    semantics) or "table" (TPU-fast phase-quantized rows + factored LO,
    see ops.correlate.correlate_block_fast). The codes argument is the
    padded code table [C, L+2] for "gather", or the phase-row table
    [C, 4*PH, blkmax] int8 for "table"
    (code_tables.phase_row_table rows for the tracked PRNs).

    Returns track_chunk(chunk_iq[N, 2], codes,
                        consts: (carr_base_u32[C], inv_aid_f32[C]),
                        state: TrackState with [C] leaves)
      -> (new_state, TrackOut with [n_blocks, C] leaves).
    """
    spc = sig.samples_per_code
    blkmax = blkmax or (spc + 2)
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw, trk.pdi)
    f32 = jnp.float32
    c_dll_p = f32(tau2 / tau1)
    c_dll_i = f32(trk.pdi / tau1)
    k1, k2, k3 = f32(k1), f32(k2), f32(k3)
    from gnsstpu.ops.correlate import correlate_block_fast

    kw = dict(
        blkmax=blkmax,
        spacing=trk.el_spacing,
        code_length=sig.code_length,
        base_code_step=float(np.float64(sig.code_freq) / sig.fs),
        inv_fs=1.0 / sig.fs,
    )
    if code_mode == "table":
        corr = functools.partial(correlate_block_fast, **kw)
    elif code_mode == "gather":
        corr = functools.partial(correlate_block, **kw)
    else:
        raise ValueError(f"unknown code_mode {code_mode!r}")

    def one_block(chunk, padded_code, carr_base_u32, inv_aid,
                  st: TrackState):
        out, cs = corr(chunk, padded_code, carr_base_u32, st.corr)

        # FLL discriminator: cross/dot over consecutive prompts,
        # normalized atan2/pi (tracking.sci:292-299). The "atan" variant
        # folds to 2 quadrants via sign(dot), making it invariant under a
        # data/NH sign flip between the two prompts (flip negates both
        # cross and dot) at half the pull-in range.
        i1, q1 = out.ip, out.qp
        cross = i1 * st.qp_prev - st.ip_prev * q1
        dot = i1 * st.ip_prev + q1 * st.qp_prev
        if trk.fll_disc == "atan":
            freq_err = (jnp.arctan2(cross * jnp.sign(dot), jnp.abs(dot))
                        * f32(1.0 / np.pi))
        else:
            freq_err = jnp.arctan2(cross, jnp.abs(dot)) * f32(1.0 / np.pi)

        # Costas phase discriminator atan(Q/I)/2pi (tracking.sci:302).
        denom = jnp.where(jnp.abs(i1) < 1e-10, f32(1e-10), i1)
        carr_err = jnp.arctan(q1 / denom) * f32(1.0 / (2.0 * np.pi))

        carr_nco = (st.carr_nco + k1 * carr_err - k2 * st.old_carr_err
                    - k3 * freq_err)
        carr_delta = st.doppler_basis + carr_nco

        # Normalized early-late envelope DLL (tracking.sci:319-322).
        e = jnp.sqrt(out.ie * out.ie + out.qe * out.qe)
        l = jnp.sqrt(out.il * out.il + out.ql * out.ql)
        code_err = (e - l) / jnp.maximum(e + l, f32(1e-10))
        code_nco = (st.code_nco + c_dll_p * (code_err - st.old_code_err)
                    + code_err * c_dll_i)
        # Carrier-aided code frequency (tracking.sci:334).
        code_delta = -code_nco + carr_delta * inv_aid

        new_state = TrackState(
            corr=cs._replace(code_delta=code_delta, carr_delta=carr_delta),
            doppler_basis=st.doppler_basis,
            carr_nco=carr_nco,
            old_carr_err=carr_err,
            code_nco=code_nco,
            old_code_err=code_err,
            ip_prev=i1,
            qp_prev=q1,
        )
        tout = TrackOut(
            ie=out.ie, qe=out.qe, ip=out.ip, qp=out.qp, il=out.il, ql=out.ql,
            carr_doppler=carr_delta,
            code_freq_delta=code_delta,
            rem_code_phase=out.rem_code_phase,
            blksize=out.blksize,
            dll_disc=code_err,
            dll_disc_filt=code_nco,
            pll_disc=carr_err,
            pll_disc_filt=carr_nco,
        )
        return new_state, tout

    vblock = jax.vmap(one_block, in_axes=(None, 0, 0, 0, 0))

    @jax.jit
    def track_chunk(chunk, padded_codes, consts, state):
        carr_base_u32, inv_aid = consts

        def step(st, _):
            return vblock(chunk, padded_codes, carr_base_u32, inv_aid, st)

        return jax.lax.scan(step, state, None, length=n_blocks)

    return track_chunk
