"""Fused early/prompt/late correlator block op.

One call processes one code period (~1 ms) for one channel: carrier wipeoff
from an integer NCO, fractional-phase E/P/L code sampling, and the six
accumulator dot products — the TPU equivalent of the reference's hot loops
(Scilab GPS/L1/tracking.sci:244-289, SSE Correlator::Accum
objects/correlator.cpp:425-448, namuru rtl/tracking_channel.v).

Design notes (TPU-first):
  * Fixed-size sample blocks (`blkmax` = samples_per_code + margin) with a
    validity mask — the reference's data-dependent blksize (ceil((L-rem)/step),
    tracking.sci:220) varies by ±1 sample; we keep static shapes and mask the
    tail so everything lives under jit/scan.
  * Carrier phase is an exact uint32 NCO (see gnsstpu.ops.nco); code phase is
    an fp32 chip ramp whose worst-case error (~6e-5 chip/block) is far below
    the DLL noise floor and is fully consistent with the reported remainder.
  * The six accumulators are one [3, blk] x [blk, 2] matmul so channels
    vmap into a single batched GEMM.

vmap over channels; scan over blocks (see gnsstpu.tracking.scan).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnsstpu.ops import nco


class CorrState(NamedTuple):
    """Per-channel correlator phase state (all scalars; pytree-friendly)."""

    rem_code_phase: jax.Array   # f32, chips in (-1, 1)
    carr_phase_u32: jax.Array   # u32 carrier NCO phase
    sample_pos: jax.Array       # i32, next unread sample (chunk-relative)
    code_delta: jax.Array       # f32, codeFreq - code_freq_basis [Hz]
    carr_delta: jax.Array       # f32, carrFreq - if_freq [Hz]

    @staticmethod
    def init(code_phase_samples, carr_doppler_hz, dtype=jnp.float32):
        z = jnp.zeros((), dtype)
        return CorrState(
            rem_code_phase=z,
            carr_phase_u32=jnp.zeros((), jnp.uint32),
            sample_pos=jnp.asarray(code_phase_samples, jnp.int32),
            code_delta=z,
            carr_delta=jnp.asarray(carr_doppler_hz, jnp.float32),
        )


class BlockOut(NamedTuple):
    """Per-block correlator outputs (per channel)."""

    ie: jax.Array
    qe: jax.Array
    ip: jax.Array
    qp: jax.Array
    il: jax.Array
    ql: jax.Array
    blksize: jax.Array          # i32 samples consumed
    rem_code_phase: jax.Array   # f32 remainder *after* this block


def correlate_block(
    chunk: jax.Array,
    padded_code: jax.Array,
    base_carr_step_u32: jax.Array,
    state: CorrState,
    *,
    blkmax: int,
    spacing: float,
    code_length: int,
    base_code_step: float,
    inv_fs: float,
):
    """Correlate one code period starting at state.sample_pos.

    Args:
      chunk: f32 [N, 2] iq32 IF samples (shared across channels).
      padded_code: f32/int8 [code_length + 2] (see code_tables.padded_code_table).
      base_carr_step_u32: uint32 scalar carrier NCO step at this channel's
        nominal carrier (exact, computed on host; per-channel so FDMA
        signals — GLONASS L1/L2, reference GLONASS/L1/initSettings.sci
        L1_IF_step — keep full NCO precision with only a small f32
        Doppler delta on top).
      state: CorrState scalars for this channel.
      blkmax: static max block length in samples.
      spacing: early-late offset [chips].
      code_length: chips per code period.
      base_code_step: code chips per sample at nominal code frequency (f64→f32
        once, on host).
      inv_fs: 1/fs.

    Returns (BlockOut, new CorrState) — loop-filter deltas are untouched;
    the tracking layer rewrites them from the discriminators.
    """
    f32 = jnp.float32
    step = f32(base_code_step) + state.code_delta * f32(inv_fs)
    blksize_f = jnp.ceil((f32(code_length) - state.rem_code_phase) / step)
    blksize = jnp.clip(blksize_f.astype(jnp.int32), 1, blkmax)

    window = jax.lax.dynamic_slice(
        chunk, (state.sample_pos, jnp.int32(0)), (blkmax, 2))

    # Carrier wipeoff with conjugate LO: bb = x * exp(-i*phase);
    # I = Re(bb), Q = Im(bb). (Same structure as the reference's wipeoff
    # tracking.sci:276-281 — sign convention here is standard complex
    # baseband: signal carrier exp(+i*theta), LO exp(-i*theta).)
    carr_step = (
        base_carr_step_u32.astype(jnp.uint32)
        + nco.delta_freq_to_step_i32(state.carr_delta, 1.0 / inv_fs).astype(
            jnp.uint32
        )
    )
    phases, _ = nco.carrier_ramp_u32(state.carr_phase_u32, carr_step, blkmax)
    ang = nco.phase_u32_to_angle(phases)
    lo_re, lo_im = jnp.cos(ang), jnp.sin(ang)
    x_re, x_im = window[:, 0], window[:, 1]
    bb_i = x_re * lo_re + x_im * lo_im   # Re(x * conj(lo))
    bb_q = x_im * lo_re - x_re * lo_im   # Im(x * conj(lo))

    k = jnp.arange(blkmax, dtype=f32)
    mask = (jnp.arange(blkmax, dtype=jnp.int32) < blksize).astype(f32)

    # E/P/L fractional-phase chip indices: floor(t) + 1 into the padded code.
    # Same structure as the reference (tracking.sci:244-262) but with
    # point-sampling at the start of each sample interval (floor) rather
    # than SoftGNSS's interval-end ceil — floor matches a physically
    # point-sampled front end and our simulator exactly.
    t_p = state.rem_code_phase + k * step
    codes = []
    for off in (-spacing, 0.0, spacing):
        idx = jnp.floor(t_p + f32(off)).astype(jnp.int32) + 1
        idx = jnp.clip(idx, 0, code_length + 1)
        codes.append(jnp.take(padded_code, idx).astype(f32))
    code_mat = jnp.stack(codes)                      # [3, blkmax]

    bb = jnp.stack([bb_i * mask, bb_q * mask], axis=-1)   # [blkmax, 2]
    acc = jnp.dot(code_mat, bb, preferred_element_type=f32)  # [3, 2]

    new_rem = state.rem_code_phase + blksize.astype(f32) * step - f32(
        code_length
    )
    new_carr_phase = state.carr_phase_u32 + blksize.astype(jnp.uint32) * carr_step

    out = BlockOut(
        ie=acc[0, 0], qe=acc[0, 1],
        ip=acc[1, 0], qp=acc[1, 1],
        il=acc[2, 0], ql=acc[2, 1],
        blksize=blksize,
        rem_code_phase=new_rem,
    )
    new_state = state._replace(
        rem_code_phase=new_rem,
        carr_phase_u32=new_carr_phase,
        sample_pos=state.sample_pos + blksize,
    )
    return out, new_state


def correlate_block_fast(
    chunk: jax.Array,
    code_rows: jax.Array,
    base_carr_step_u32: jax.Array,
    state: CorrState,
    *,
    blkmax: int,
    spacing: float,
    code_length: int,
    base_code_step: float,
    inv_fs: float,
    phases_per_chip: int = 64,
):
    """TPU-fast variant of correlate_block.

    Differences (both preserve the exact phase/NCO bookkeeping; only the
    *sampled waveforms* are approximated at levels far below loop noise):
      * carrier LO from the factored outer product (nco.lo_iq_factored)
        instead of 2*blkmax transcendentals;
      * E/P/L codes fetched as whole pre-sampled rows from the
        phase-quantized table (code_tables.phase_row_table) — chip-phase
        quantization 1/phases_per_chip chips, and the within-block chip
        rate is the nominal one (the carrier-aided deviation reaches at
        most ~5e-3 chips across a block) — instead of 3 per-sample
        gathers. The rem_code_phase / pseudorange bookkeeping stays exact.

    code_rows: int8/f32 [4*phases_per_chip, blkmax] for this channel.
    """
    f32 = jnp.float32
    step = f32(base_code_step) + state.code_delta * f32(inv_fs)
    blksize_f = jnp.ceil((f32(code_length) - state.rem_code_phase) / step)
    blksize = jnp.clip(blksize_f.astype(jnp.int32), 1, blkmax)

    window = jax.lax.dynamic_slice(
        chunk, (state.sample_pos, jnp.int32(0)), (blkmax, 2))

    carr_step = (
        base_carr_step_u32.astype(jnp.uint32)
        + nco.delta_freq_to_step_i32(state.carr_delta, 1.0 / inv_fs).astype(
            jnp.uint32
        )
    )
    lo_re, lo_im = nco.lo_iq_factored(state.carr_phase_u32, carr_step,
                                      blkmax)
    x_re, x_im = window[:, 0], window[:, 1]
    bb_i = x_re * lo_re + x_im * lo_im
    bb_q = x_im * lo_re - x_re * lo_im

    mask = (jnp.arange(blkmax, dtype=jnp.int32)
            < blksize).astype(f32)

    ph = f32(phases_per_chip)
    rows = 4 * phases_per_chip
    codes = []
    for off in (-spacing, 0.0, spacing):
        p = jnp.round((state.rem_code_phase + f32(off) + f32(2.0)) * ph)
        p = jnp.clip(p.astype(jnp.int32), 0, rows - 1)
        row = jax.lax.dynamic_slice(code_rows, (p, jnp.int32(0)),
                                    (1, blkmax))[0]
        codes.append(row.astype(f32))
    code_mat = jnp.stack(codes)                          # [3, blkmax]

    bb = jnp.stack([bb_i * mask, bb_q * mask], axis=-1)   # [blkmax, 2]
    acc = jnp.dot(code_mat, bb, preferred_element_type=f32)  # [3, 2]

    new_rem = state.rem_code_phase + blksize.astype(f32) * step - f32(
        code_length
    )
    new_carr_phase = (state.carr_phase_u32
                      + blksize.astype(jnp.uint32) * carr_step)

    out = BlockOut(
        ie=acc[0, 0], qe=acc[0, 1],
        ip=acc[1, 0], qp=acc[1, 1],
        il=acc[2, 0], ql=acc[2, 1],
        blksize=blksize,
        rem_code_phase=new_rem,
    )
    new_state = state._replace(
        rem_code_phase=new_rem,
        carr_phase_u32=new_carr_phase,
        sample_pos=state.sample_pos + blksize,
    )
    return out, new_state
