"""Fused dual-code (pilot + data) E/P/L correlator block op.

GLONASS L3OC tracks two ranging codes per satellite — pilot code(prn) and
data code(prn+32) — against the same baseband signal, producing 12
accumulators per code period (reference GLONASS/L3/tracking.sci:312-354:
I/Q x E/P/L for caCode and caCode2). TPU form: one carrier wipeoff shared
by both components and a single [6, blk] x [blk, 2] matmul, so the dual
correlator costs barely more than the single-code one and vmaps over
channels into one batched GEMM.

Both codes share one code NCO (they are chip-synchronous by construction
on the satellite), so the phase state is a plain CorrState.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnsstpu.ops import nco
from gnsstpu.ops.correlate import CorrState


class DualBlockOut(NamedTuple):
    """Pilot (ie..ql) + data (ie2..ql2) accumulators for one block."""

    ie: jax.Array
    qe: jax.Array
    ip: jax.Array
    qp: jax.Array
    il: jax.Array
    ql: jax.Array
    ie2: jax.Array
    qe2: jax.Array
    ip2: jax.Array
    qp2: jax.Array
    il2: jax.Array
    ql2: jax.Array
    blksize: jax.Array
    rem_code_phase: jax.Array


def correlate_block_dual(
    chunk: jax.Array,
    padded_code: jax.Array,
    padded_code2: jax.Array,
    base_carr_step_u32: jax.Array,
    state: CorrState,
    *,
    blkmax: int,
    spacing: float,
    code_length: int,
    base_code_step: float,
    inv_fs: float,
):
    """Correlate one code period of both components.

    Args match ops.correlate.correlate_block plus padded_code2 (the data
    component's padded code, f32/int8 [code_length + 2]).
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
    phases, _ = nco.carrier_ramp_u32(state.carr_phase_u32, carr_step, blkmax)
    ang = nco.phase_u32_to_angle(phases)
    lo_re, lo_im = jnp.cos(ang), jnp.sin(ang)
    x_re, x_im = window[:, 0], window[:, 1]
    bb_i = x_re * lo_re + x_im * lo_im
    bb_q = x_im * lo_re - x_re * lo_im

    k = jnp.arange(blkmax, dtype=f32)
    mask = (jnp.arange(blkmax, dtype=jnp.int32) < blksize).astype(f32)

    t_p = state.rem_code_phase + k * step
    rows = []
    for code in (padded_code, padded_code2):
        for off in (-spacing, 0.0, spacing):
            idx = jnp.floor(t_p + f32(off)).astype(jnp.int32) + 1
            idx = jnp.clip(idx, 0, code_length + 1)
            rows.append(jnp.take(code, idx).astype(f32))
    code_mat = jnp.stack(rows)                            # [6, blkmax]

    bb = jnp.stack([bb_i * mask, bb_q * mask], axis=-1)   # [blkmax, 2]
    acc = jnp.dot(code_mat, bb, preferred_element_type=f32)   # [6, 2]

    new_rem = state.rem_code_phase + blksize.astype(f32) * step - f32(
        code_length
    )
    new_carr_phase = (state.carr_phase_u32
                      + blksize.astype(jnp.uint32) * carr_step)

    out = DualBlockOut(
        ie=acc[0, 0], qe=acc[0, 1],
        ip=acc[1, 0], qp=acc[1, 1],
        il=acc[2, 0], ql=acc[2, 1],
        ie2=acc[3, 0], qe2=acc[3, 1],
        ip2=acc[4, 0], qp2=acc[4, 1],
        il2=acc[5, 0], ql2=acc[5, 1],
        blksize=blksize,
        rem_code_phase=new_rem,
    )
    new_state = state._replace(
        rem_code_phase=new_rem,
        carr_phase_u32=new_carr_phase,
        sample_pos=state.sample_pos + blksize,
    )
    return out, new_state
