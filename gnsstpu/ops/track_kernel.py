"""Fused Pallas tracking kernel: the whole chunk scan in one TPU kernel.

The XLA lax.scan tracking engine (gnsstpu.tracking.scan) dispatches several
small kernels per 1 ms block; at ~50-150 us of launch overhead per block
that caps 12-channel tracking near ~6x real time. This kernel runs the
ENTIRE (n_blocks x channels) scan as one pallas_call: the grid dimension is
the sequential block loop (TPU grid steps execute in order on a core), the
loop-filter state lives in VMEM/SMEM scratch across steps, and each step
does carrier wipeoff (factored LO), E/P/L row correlation
(phase-quantized code tables), and the DLL/FLL-assisted-PLL update — the
same math as tracking.scan one_block with code_mode="table", numerics
matched (see tests/test_track_kernel.py).

Replaces the role of the reference's per-ms hot loops (tracking.sci:244-335,
Correlator::Accum correlator.cpp:425-448, namuru tracking_channel.v) with
one resident device program.

Layouts (TPU-friendly):
  chunk_t  f32 [2, N]           I/Q planes, samples along lanes
  tab      int8 [C, R, BLKP]     phase-row code tables (code_tables)
  finit    f32 [NF, C]           float state rows (see _F_* indices)
  cinit    u32 [1, C]            carrier NCO phase
  pos0     i32 [C]               scalar-prefetch: chunk cursor per channel
  consts   f32 [2, C]            row 0 doppler_basis, row 1 inv_aid
  carrbase u32 [1, C]            per-channel base carrier NCO step
Outputs:
  out      f32 [n_blocks, 16, C] per-block observables (_O_* indices)
  ffin     f32 [NF, C]; cfin u32 [1, C]; posfin i32 [1, C]
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Float-state row indices.
_F_REM, _F_CODE_DELTA, _F_CARR_DELTA, _F_CARR_NCO, _F_OLD_CARR_ERR, \
    _F_CODE_NCO, _F_OLD_CODE_ERR, _F_IP_PREV, _F_QP_PREV = range(9)
NF = 9

# Output row indices (match tracking.scan.TrackOut field order).
(O_IE, O_QE, O_IP, O_QP, O_IL, O_QL, O_CARR_DOPPLER, O_CODE_FREQ_DELTA,
 O_REM, O_BLKSIZE, O_DLL_DISC, O_DLL_FILT, O_PLL_DISC, O_PLL_FILT) = \
    range(14)
NOUT = 16                      # padded to 16 rows


def _atan(z):
    """arctan for Mosaic (no atan2/atan primitive): minimax polynomial on
    [0, 1] + reciprocal identity, max error ~1e-7 rad — far below
    discriminator noise."""
    f32 = jnp.float32
    az = jnp.abs(z)
    inv = az > f32(1.0)
    w = jnp.where(inv, f32(1.0) / jnp.maximum(az, f32(1.0)), az)
    t = w * w
    p = w * (f32(0.99997726) + t * (f32(-0.33262347) + t * (
        f32(0.19354346) + t * (f32(-0.11643287) + t * (
            f32(0.05265332) + t * f32(-0.01172120))))))
    r = jnp.where(inv, f32(np.pi / 2) - p, p)
    return jnp.where(z < 0, -r, r)


def _make_kernel(*, n_blocks: int, n_channels: int, n_lanes: int,
                 blkp: int,
                 code_length: int, phases_per_chip: int, d_samples: int,
                 span_chips: float, base_code_step: float, inv_fs: float,
                 fs: float, k1: float, k2: float, k3: float,
                 c_dll_p: float, c_dll_i: float):
    # Mosaic requires the lane (last) dimension of every VMEM ref to be
    # handled in 128-sized tiles; the channel axis rides the lanes, so all
    # [*, C] refs are padded to CP = n_lanes (a multiple of 128) and the
    # wrapper slices the first C lanes back out.
    C = n_channels
    CP = n_lanes
    f32 = jnp.float32
    rows_total = int(round(2 * span_chips * phases_per_chip))
    ph_f = float(phases_per_chip)
    nco_scale = float(4294967296.0 / fs)
    # Dynamic-shift lane rolls require a lane count that is a multiple of
    # 128 (Mosaic lowering constraint found empirically).
    wide = -(-(blkp + 128) // 128) * 128

    def kernel(pos0_sm, cinit_sm, chunk_ref, tab_ref, finit_ref,
               consts_ref, carrbase_ref,
               out_ref, ffin_ref, cfin_ref, posfin_ref,
               fstate, cphase_sm, pos_sm, blk_sm, cstep_sm, row_sm):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            fstate[:, :] = finit_ref[:, :]
            for c in range(C):
                pos_sm[c] = pos0_sm[c]
                cphase_sm[c] = cinit_sm[c]

        # ---- Phase 0: vectorized per-channel block geometry [1, C] ----
        rem = fstate[_F_REM:_F_REM + 1, :]
        code_delta = fstate[_F_CODE_DELTA:_F_CODE_DELTA + 1, :]
        carr_delta = fstate[_F_CARR_DELTA:_F_CARR_DELTA + 1, :]
        step = f32(base_code_step) + code_delta * f32(inv_fs)
        blkf = jnp.ceil((f32(code_length) - rem) / step)
        blk = jnp.clip(blkf.astype(jnp.int32), 1, blkp)
        cstep = (carrbase_ref[0:1, :]
                 + pltpu.bitcast(
                     jnp.round(carr_delta * f32(nco_scale)
                               ).astype(jnp.int32), jnp.uint32))
        prow = jnp.round((rem + f32(span_chips)) * f32(ph_f))
        prow = jnp.clip(prow.astype(jnp.int32), 0, rows_total - 1)
        for c in range(C):
            blk_sm[c] = blk[0, c]
            cstep_sm[c] = cstep[0, c]
            row_sm[c] = prow[0, c]

        # ---- Phase A: correlation, channels batched across sublanes ----
        # The TPU compiler supports dynamic slicing only on sublanes (and
        # 128-aligned lanes), so each channel's sample window is fetched
        # with an aligned lane slice + dynamic roll; the windows, code
        # rows, and NCO scalars are then stacked into [C, blkp] so the
        # heavy elementwise work (LO trig, wipeoff, code multiply, lane
        # reduction) runs across all channel sublanes at once instead of
        # one VPU sublane at a time.
        wins, prows = [], []
        for c in range(C):
            pos = pos_sm[c]
            al = pl.multiple_of((pos // 128) * 128, 128)
            off = pos - al
            # pltpu.roll needs shift >= 0: roll(x, -off) == roll(x, W-off).
            wins.append(pltpu.roll(chunk_ref[0:2, pl.ds(al, wide)],
                                   shift=wide - off, axis=1))
            prows.append(tab_ref[c, pl.ds(row_sm[c], 1), :])
            pos_sm[c] = pos + blk_sm[c]
        xi = jnp.concatenate([w[0:1, :blkp] for w in wins], axis=0)
        xq = jnp.concatenate([w[1:2, :blkp] for w in wins], axis=0)
        p_rows = jnp.concatenate(prows, axis=0)            # [C, blkp]

        ph_col = jnp.concatenate(
            [cphase_sm[c].reshape(1, 1) for c in range(C)], axis=0)
        step_col = jnp.concatenate(
            [cstep_sm[c].reshape(1, 1) for c in range(C)], axis=0)
        blk_col = jnp.concatenate(
            [blk_sm[c].reshape(1, 1) for c in range(C)], axis=0)
        for c in range(C):
            cphase_sm[c] = (cphase_sm[c]
                            + blk_sm[c].astype(jnp.uint32) * cstep_sm[c])

        # Exact u32 NCO phase per (channel, sample): modular arithmetic on
        # the lane iota; the i32 bitcast view differs by exactly 2^32 when
        # negative = 2*pi in angle — cos/sin unchanged, |angle| <= pi so
        # f32 precision is maximal.
        iota_u = jax.lax.broadcasted_iota(jnp.uint32, (C, blkp), 1)
        ang = ph_col + iota_u * step_col
        a = (pltpu.bitcast(ang, jnp.int32).astype(f32)
             * f32(2.0 * np.pi / 4294967296.0))
        lo_c, lo_s = jnp.cos(a), jnp.sin(a)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (C, blkp), 1)
                < blk_col).astype(f32)
        bb_i = (xi * lo_c + xq * lo_s) * mask
        bb_q = (xq * lo_c - xi * lo_s) * mask
        # E[k] = P[k - d], L[k] = P[k + d] (static-shift circular roll;
        # wrap feeds <=d noise samples out of ~blkp — far below the
        # accumulation noise).
        e_rows = pltpu.roll(p_rows, shift=d_samples, axis=1)
        l_rows = pltpu.roll(p_rows, shift=blkp - d_samples, axis=1)
        acc = jnp.concatenate([
            jnp.sum(code * bb, axis=1, keepdims=True)
            for code in (e_rows, p_rows, l_rows) for bb in (bb_i, bb_q)
        ], axis=1)                                          # [C, 6]
        acc_t = jnp.transpose(acc, (1, 0))                  # [6, C]

        # ---- Phase B: vectorized discriminators + loop filters [1, CP] --
        if CP == C:
            acc_p = acc_t
        else:
            acc_p = jnp.pad(acc_t, ((0, 0), (0, CP - C)))
        ie, qe, ip, qp, il, ql = (acc_p[j:j + 1, :] for j in range(6))
        ip_prev = fstate[_F_IP_PREV:_F_IP_PREV + 1, :]
        qp_prev = fstate[_F_QP_PREV:_F_QP_PREV + 1, :]
        cross = ip * qp_prev - ip_prev * qp
        dot = jnp.abs(ip * ip_prev + qp * qp_prev)
        # dot >= 0, so atan2(cross, dot) == atan(cross/dot).
        freq_err = _atan(cross / jnp.maximum(dot, f32(1e-30))) \
            * f32(1.0 / np.pi)
        denom = jnp.where(jnp.abs(ip) < 1e-10, f32(1e-10), ip)
        carr_err = _atan(qp / denom) * f32(1.0 / (2.0 * np.pi))

        old_carr_err = fstate[_F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1, :]
        carr_nco = (fstate[_F_CARR_NCO:_F_CARR_NCO + 1, :]
                    + f32(k1) * carr_err - f32(k2) * old_carr_err
                    - f32(k3) * freq_err)
        doppler_basis = consts_ref[0:1, :]
        inv_aid = consts_ref[1:2, :]
        new_carr_delta = doppler_basis + carr_nco

        e_env = jnp.sqrt(ie * ie + qe * qe)
        l_env = jnp.sqrt(il * il + ql * ql)
        code_err = (e_env - l_env) / jnp.maximum(e_env + l_env, f32(1e-10))
        old_code_err = fstate[_F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1, :]
        code_nco = (fstate[_F_CODE_NCO:_F_CODE_NCO + 1, :]
                    + f32(c_dll_p) * (code_err - old_code_err)
                    + code_err * f32(c_dll_i))
        new_code_delta = -code_nco + new_carr_delta * inv_aid

        new_rem = rem + blk.astype(f32) * step - f32(code_length)

        fstate[_F_REM:_F_REM + 1, :] = new_rem
        fstate[_F_CODE_DELTA:_F_CODE_DELTA + 1, :] = new_code_delta
        fstate[_F_CARR_DELTA:_F_CARR_DELTA + 1, :] = new_carr_delta
        fstate[_F_CARR_NCO:_F_CARR_NCO + 1, :] = carr_nco
        fstate[_F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1, :] = carr_err
        fstate[_F_CODE_NCO:_F_CODE_NCO + 1, :] = code_nco
        fstate[_F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1, :] = code_err
        fstate[_F_IP_PREV:_F_IP_PREV + 1, :] = ip
        fstate[_F_QP_PREV:_F_QP_PREV + 1, :] = qp

        zero = jnp.zeros((1, CP), f32)
        out_ref[:, :] = jnp.concatenate([
            ie, qe, ip, qp, il, ql, new_carr_delta, new_code_delta,
            new_rem, blk.astype(f32), code_err, code_nco, carr_err,
            carr_nco, zero, zero], axis=0)

        @pl.when(i == n_blocks - 1)
        def _():
            ffin_ref[:, :] = fstate[:, :]
            upad = ([] if CP == C else
                    [jnp.zeros((1, CP - C), jnp.uint32)])
            ipad = ([] if CP == C else
                    [jnp.zeros((1, CP - C), jnp.int32)])
            cfin_ref[0:1, :] = jnp.concatenate(
                [cphase_sm[c].reshape(1, 1) for c in range(C)] + upad,
                axis=1)
            posfin_ref[0:1, :] = jnp.concatenate(
                [pos_sm[c].reshape(1, 1) for c in range(C)] + ipad,
                axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "blkp", "code_length", "phases_per_chip",
                     "d_samples", "span_chips", "base_code_step", "fs",
                     "coefs", "interpret"))
def track_chunk_fused(chunk_t, tab, pos0, finit, cinit, consts, carrbase,
                      *, n_blocks: int, blkp: int, code_length: int,
                      phases_per_chip: int, d_samples: int,
                      span_chips: float, base_code_step: float, fs: float,
                      coefs, interpret: bool = False):
    """Run the fused kernel. coefs = (k1, k2, k3, c_dll_p, c_dll_i).

    chunk_t must have lane length >= max sample pos + blkp + 256 (aligned
    window reads). d_samples: E/L offset in whole samples.
    """
    C = pos0.shape[0]
    CP = -(-C // 128) * 128            # channel lanes padded for Mosaic
    k1, k2, k3, c_dll_p, c_dll_i = coefs
    kernel = _make_kernel(
        n_blocks=n_blocks, n_channels=C, n_lanes=CP, blkp=blkp,
        code_length=code_length, phases_per_chip=phases_per_chip,
        d_samples=d_samples, span_chips=span_chips,
        base_code_step=base_code_step, inv_fs=1.0 / fs,
        fs=fs, k1=k1, k2=k2, k3=k3, c_dll_p=c_dll_p, c_dll_i=c_dll_i)

    lane_pad = ((0, 0), (0, CP - C))
    finit = jnp.pad(finit, lane_pad)
    consts = jnp.pad(consts, lane_pad)
    carrbase = jnp.pad(carrbase, lane_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # pos0, cinit
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tab
            pl.BlockSpec(memory_space=pltpu.VMEM),   # finit
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # carrbase
        ],
        out_specs=(
            pl.BlockSpec((1, NOUT, CP), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NF, CP), jnp.float32),       # fstate
            pltpu.SMEM((C,), jnp.uint32),            # carrier phase
            pltpu.SMEM((C,), jnp.int32),             # pos
            pltpu.SMEM((C,), jnp.int32),             # blk
            pltpu.SMEM((C,), jnp.uint32),            # cstep
            pltpu.SMEM((C,), jnp.int32),             # prompt code row
        ],
    )

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, NOUT, CP), jnp.float32),
        jax.ShapeDtypeStruct((NF, CP), jnp.float32),
        jax.ShapeDtypeStruct((1, CP), jnp.uint32),
        jax.ShapeDtypeStruct((1, CP), jnp.int32),
    )

    def fixed_out_kernel(pos0_sm, cinit_sm, chunk_ref, tab_ref, finit_ref,
                         consts_ref, carrbase_ref, out_ref, ffin_ref,
                         cfin_ref, posfin_ref, *scratch):
        # out_ref block is [1, NOUT, C]; present it as [NOUT, C].
        kernel(pos0_sm, cinit_sm, chunk_ref, tab_ref, finit_ref,
               consts_ref, carrbase_ref, out_ref.at[0], ffin_ref,
               cfin_ref, posfin_ref, *scratch)

    out, ffin, cfin, posfin = pl.pallas_call(
        fixed_out_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(pos0, cinit.reshape(-1), chunk_t, tab, finit, consts, carrbase)
    return (out[:, :, :C], ffin[:, :C], cfin[:, :C], posfin[:, :C])
