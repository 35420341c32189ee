"""Fused BOC double-estimator correlator block op (Galileo E1).

One call processes one 4 ms E1B code period for one channel: carrier
wipeoff, independent fractional-phase sampling of the primary code (E/P/L)
and of the BOC(1,1) subcarrier ("meandr", E/P/L), and the ten accumulators
I/Q x {E_P, P_E, P_P, P_L, L_P} of the reference's double-estimator
tracker (GALILEO/E1/tracking.sci:300-430; subscript order is
(meandr, code) as in the reference: I_E_P = early meandr x prompt code).

TPU-first notes (same design rules as ops.correlate.correlate_block):
fixed blkmax + tail mask, exact uint32 carrier NCO, two f32 chip ramps
(code in primary chips, meandr in half-chips), and the ten accumulators
as one [5, blk] x [blk, 2] matmul. The five tap waveforms come from six
gathers (3 code + 3 meandr) and elementwise products — the generalized
"(code-delay, subcarrier-delay) taps" correlator SURVEY.md §7 calls for.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnsstpu.ops import nco


class BocCorrState(NamedTuple):
    """Per-channel double-estimator phase state (scalars)."""

    rem_code_phase: jax.Array   # f32, primary chips in (-1, 1)
    rem_sub_phase: jax.Array    # f32, meandr half-chips in (-1, 1)
    carr_phase_u32: jax.Array
    sample_pos: jax.Array       # i32
    code_delta: jax.Array       # f32, codeFreq - code basis [Hz] (1.023M clock)
    sub_delta: jax.Array        # f32, meandrFreq - sub basis [Hz] (2.046M clock)
    carr_delta: jax.Array       # f32, carrFreq - IF [Hz]


class BocBlockOut(NamedTuple):
    """Ten accumulators (reference naming: first subscript = meandr delay,
    second = code delay) + block bookkeeping."""

    i_ep: jax.Array
    q_ep: jax.Array
    i_pe: jax.Array
    q_pe: jax.Array
    i_pp: jax.Array
    q_pp: jax.Array
    i_pl: jax.Array
    q_pl: jax.Array
    i_lp: jax.Array
    q_lp: jax.Array
    blksize: jax.Array
    rem_code_phase: jax.Array
    rem_sub_phase: jax.Array


def correlate_block_boc(
    chunk: jax.Array,
    padded_code: jax.Array,
    padded_sub: jax.Array,
    base_carr_step_u32: jax.Array,
    state: BocCorrState,
    *,
    blkmax: int,
    code_spacing: float,
    sub_spacing: float,
    code_length: int,
    sub_length: int,
    base_code_step: float,
    base_sub_step: float,
    inv_fs: float,
):
    """Correlate one code period with split code/subcarrier estimators.

    padded_code: [code_length + 2] primary code (±1), index floor(t)+1.
    padded_sub:  [sub_length + 2] meandr (±1).
    code_spacing: DLL early-late offset [primary chips]
      (ref initSettings.sci:98 dllCorrelatorSpacing = 0.25).
    sub_spacing: SLL offset [meandr half-chips]
      (ref initSettings.sci:103 sllCorrelatorSpacing = 0.1).
    """
    f32 = jnp.float32
    step_c = f32(base_code_step) + state.code_delta * f32(inv_fs)
    step_s = f32(base_sub_step) + state.sub_delta * f32(inv_fs)
    blksize_f = jnp.ceil((f32(code_length) - state.rem_code_phase) / step_c)
    blksize = jnp.clip(blksize_f.astype(jnp.int32), 1, blkmax)

    window = jax.lax.dynamic_slice(
        chunk, (state.sample_pos, jnp.int32(0)), (blkmax, 2))

    carr_step = (
        base_carr_step_u32.astype(jnp.uint32)
        + nco.delta_freq_to_step_i32(state.carr_delta, 1.0 / inv_fs).astype(
            jnp.uint32))
    phases, _ = nco.carrier_ramp_u32(state.carr_phase_u32, carr_step, blkmax)
    ang = nco.phase_u32_to_angle(phases)
    lo_re, lo_im = jnp.cos(ang), jnp.sin(ang)
    x_re, x_im = window[:, 0], window[:, 1]
    bb_i = x_re * lo_re + x_im * lo_im
    bb_q = x_im * lo_re - x_re * lo_im

    k = jnp.arange(blkmax, dtype=f32)
    mask = (jnp.arange(blkmax, dtype=jnp.int32) < blksize).astype(f32)

    t_c = state.rem_code_phase + k * step_c
    t_s = state.rem_sub_phase + k * step_s

    def taps(t, off, padded, length):
        idx = jnp.floor(t + f32(off)).astype(jnp.int32) + 1
        return jnp.take(padded, jnp.clip(idx, 0, length + 1)).astype(f32)

    code_e = taps(t_c, -code_spacing, padded_code, code_length)
    code_p = taps(t_c, 0.0, padded_code, code_length)
    code_l = taps(t_c, code_spacing, padded_code, code_length)
    sub_e = taps(t_s, -sub_spacing, padded_sub, sub_length)
    sub_p = taps(t_s, 0.0, padded_sub, sub_length)
    sub_l = taps(t_s, sub_spacing, padded_sub, sub_length)

    tap_mat = jnp.stack([
        sub_e * code_p,    # E_P  (SLL early)
        sub_p * code_e,    # P_E  (DLL early)
        sub_p * code_p,    # P_P
        sub_p * code_l,    # P_L  (DLL late)
        sub_l * code_p,    # L_P  (SLL late)
    ])                                                   # [5, blkmax]

    bb = jnp.stack([bb_i * mask, bb_q * mask], axis=-1)   # [blkmax, 2]
    acc = jnp.dot(tap_mat, bb, preferred_element_type=f32)  # [5, 2]

    bsf = blksize.astype(f32)
    new_rem_c = state.rem_code_phase + bsf * step_c - f32(code_length)
    new_rem_s = state.rem_sub_phase + bsf * step_s - f32(sub_length)
    new_carr = state.carr_phase_u32 + blksize.astype(jnp.uint32) * carr_step

    out = BocBlockOut(
        i_ep=acc[0, 0], q_ep=acc[0, 1],
        i_pe=acc[1, 0], q_pe=acc[1, 1],
        i_pp=acc[2, 0], q_pp=acc[2, 1],
        i_pl=acc[3, 0], q_pl=acc[3, 1],
        i_lp=acc[4, 0], q_lp=acc[4, 1],
        blksize=blksize,
        rem_code_phase=new_rem_c,
        rem_sub_phase=new_rem_s,
    )
    new_state = state._replace(
        rem_code_phase=new_rem_c,
        rem_sub_phase=new_rem_s,
        carr_phase_u32=new_carr,
        sample_pos=state.sample_pos + blksize,
    )
    return out, new_state
