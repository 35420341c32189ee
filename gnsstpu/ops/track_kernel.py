"""Fused Pallas tracking kernel: the whole chunk scan in one TPU kernel.

The XLA lax.scan tracking engine (gnsstpu.tracking.scan) dispatches several
small kernels per 1 ms block; at ~50-150 us of launch overhead per block
that caps 12-channel tracking near ~6x real time. This kernel runs the
ENTIRE (n_blocks x channels) scan as one pallas_call: the grid is
(channel_tiles, blocks) — blocks iterate fastest, so each tile of CT
channels runs its sequential block loop with loop-filter state resident in
VMEM/SMEM scratch, while the next tile's code-row table streams in behind
it (Pallas double-buffers the per-tile BlockSpec slab from HBM). Each step
does carrier wipeoff (exact uint32 NCO), fractional-spacing E/P/L row
correlation (three dynamic row reads from the phase-quantized table, the
same quantization as ops.correlate.correlate_block_fast), and the
DLL/FLL-assisted-PLL update — the same math as tracking.scan one_block
with code_mode="table" (numerics matched: tests/test_track_kernel.py).

Channel-tiled grid = unbounded channel count: VMEM holds only the sample
chunk plus two table slabs, so 12 or 768 channels compile to the same
program and the per-chip scaling curve comes from one kernel (bench.py).

Replaces the role of the reference's per-ms hot loops (tracking.sci:244-335,
Correlator::Accum correlator.cpp:425-448, namuru tracking_channel.v) with
one resident device program.

Layouts (TPU-friendly; channels ride SUBLANES, fields ride lanes):
  chunk_t  f32 [2, N]            I/Q planes, samples along lanes
  tab      f32 [Cp, R, BLKP]     phase-row code tables (code_tables.
                                 prompt_row_table at span_chips)
  finit    f32 [Cp, 16]          per-channel float state+consts (_F_*)
  carrbase u32 [Cp, 1]           per-channel base carrier NCO step
  pos0     i32 [Cp]              scalar-prefetch: chunk cursor per channel
  cinit    u32 [Cp]              scalar-prefetch: carrier NCO phase
Outputs:
  out      f32 [n_blocks, Cp, 16]  per-block observables (_O_* lanes)
  ffin     f32 [Cp, 16]; ifin i32 [Cp, 8] (lane 0 pos, 1 carr-phase bits)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Float-state lane indices (finit/ffin/fstate).
(_F_REM, _F_CODE_DELTA, _F_CARR_DELTA, _F_CARR_NCO, _F_OLD_CARR_ERR,
 _F_CODE_NCO, _F_OLD_CODE_ERR, _F_IP_PREV, _F_QP_PREV,
 _F_DOPPLER_BASIS, _F_INV_AID) = range(11)
NF = 16                        # state lanes padded to 16

# Output lane indices (match tracking.scan.TrackOut field order).
(O_IE, O_QE, O_IP, O_QP, O_IL, O_QL, O_CARR_DOPPLER, O_CODE_FREQ_DELTA,
 O_REM, O_BLKSIZE, O_DLL_DISC, O_DLL_FILT, O_PLL_DISC, O_PLL_FILT) = \
    range(14)
NOUT = 16                      # padded to 16 lanes

# ifin lanes.
I_POS, I_CARR_PHASE = 0, 1
NI = 8


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


def _make_kernel(*, n_blocks: int, ct: int, blkp: int,
                 code_length: int, phases_per_chip: int, spacing: float,
                 span_chips: float, base_code_step: float, inv_fs: float,
                 fs: float, k1: float, k2: float, k3: float,
                 c_dll_p: float, c_dll_i: float):
    CT = ct
    f32 = jnp.float32
    rows_total = int(round(2 * span_chips * phases_per_chip))
    ph_f = float(phases_per_chip)
    nco_scale = float(4294967296.0 / fs)
    # Dynamic-shift lane rolls require a lane count that is a multiple of
    # 128 (Mosaic lowering constraint found empirically).
    wide = -(-(blkp + 128) // 128) * 128
    # Factored-LO geometry (see nco.lo_iq_factored): sample index
    # k = 64*a + r; trig runs on the A coarse + 64 fine angles only, the
    # full [CT, W] LO comes from one tiled multiply + an MXU expansion
    # matmul (the coarse values spread k//64-wise by the 0/1 expand
    # matrix). W = blkp rounded to lanes; A padded to a sublane multiple.
    W = -(-blkp // 128) * 128
    A = W // 64
    A_pad = -(-A // 8) * 8
    # E/P/L chip-phase offsets (E leads: code at rem - spacing, like
    # correlate_block_fast's off in (-spacing, 0, +spacing)).
    offs = (-spacing, 0.0, spacing)

    def kernel(pos0_sm, cinit_sm, chunk_ref, tab_ref, finit_ref,
               carrbase_ref, expand_ref,
               out_ref, ffin_ref, ifin_ref,
               fstate, cphase_sm, pos_sm, blk_sm, cstep_sm, row_sm):
        ctile = pl.program_id(0)
        b = pl.program_id(1)
        c0 = ctile * CT

        @pl.when(b == 0)
        def _():
            fstate[:, :] = finit_ref[:, :]
            for c in range(CT):
                pos_sm[c] = pos0_sm[c0 + c]
                cphase_sm[c] = cinit_sm[c0 + c]

        # ---- Phase 0: vectorized per-channel block geometry [CT, 1] ----
        rem = fstate[:, _F_REM:_F_REM + 1]
        code_delta = fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1]
        carr_delta = fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1]
        step = f32(base_code_step) + code_delta * f32(inv_fs)
        blkf = jnp.ceil((f32(code_length) - rem) / step)
        blk = jnp.clip(blkf.astype(jnp.int32), 1, blkp)
        cstep = (carrbase_ref[:, 0:1]
                 + pltpu.bitcast(
                     jnp.round(carr_delta * f32(nco_scale)
                               ).astype(jnp.int32), jnp.uint32))
        for j, off in enumerate(offs):
            prow = jnp.round((rem + f32(off + span_chips)) * f32(ph_f))
            prow = jnp.clip(prow.astype(jnp.int32), 0, rows_total - 1)
            for c in range(CT):
                row_sm[c, j] = prow[c, 0]
        for c in range(CT):
            blk_sm[c] = blk[c, 0]
            cstep_sm[c] = cstep[c, 0]

        # ---- Phase A: correlation, channels batched across sublanes ----
        # The TPU compiler supports dynamic slicing only on sublanes (and
        # 128-aligned lanes), so each channel's sample window is fetched
        # with an aligned lane slice + dynamic roll; the windows and code
        # rows are then stacked into [CT, blkp] so the heavy elementwise
        # work (LO trig, wipeoff, code multiply, lane reduction) runs
        # across all channel sublanes at once.
        wins, erows, prows, lrows = [], [], [], []
        for c in range(CT):
            pos = pos_sm[c]
            al = pl.multiple_of((pos // 128) * 128, 128)
            off = pos - al
            # pltpu.roll needs shift >= 0: roll(x, -off) == roll(x, W-off).
            wins.append(pltpu.roll(chunk_ref[0:2, pl.ds(al, wide)],
                                   shift=wide - off, axis=1))
            erows.append(tab_ref[c, pl.ds(row_sm[c, 0], 1), :])
            prows.append(tab_ref[c, pl.ds(row_sm[c, 1], 1), :])
            lrows.append(tab_ref[c, pl.ds(row_sm[c, 2], 1), :])
            pos_sm[c] = pos + blk_sm[c]
        xi = jnp.concatenate([w[0:1, :blkp] for w in wins], axis=0)
        xq = jnp.concatenate([w[1:2, :blkp] for w in wins], axis=0)
        e_rows = jnp.concatenate(erows, axis=0)            # [CT, blkp]
        p_rows = jnp.concatenate(prows, axis=0)
        l_rows = jnp.concatenate(lrows, axis=0)

        ph_col = jnp.concatenate(
            [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        step_col = jnp.concatenate(
            [cstep_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        for c in range(CT):
            cphase_sm[c] = (cphase_sm[c]
                            + blk_sm[c].astype(jnp.uint32) * cstep_sm[c])

        # Exact u32 NCO angles, factored k = 64*a + r (same decomposition
        # as the scan engine's nco.lo_iq_factored, so the two engines see
        # bit-identical LO waveforms): trig on A_pad coarse + 64 fine
        # angles per channel instead of blkp — the dominant VPU cost of
        # wipeoff drops ~40x. All phase arithmetic wraps in uint32 (the
        # i32 bitcast view differs by exactly 2^32 = 2*pi when negative).
        ang_scale = f32(2.0 * np.pi / 4294967296.0)
        iota_a = jax.lax.broadcasted_iota(jnp.uint32, (CT, A_pad), 1)
        ka = ph_col + iota_a * (step_col * jnp.uint32(64))
        aa = pltpu.bitcast(ka, jnp.int32).astype(f32) * ang_scale
        ca, sa = jnp.cos(aa), jnp.sin(aa)
        iota_r = jax.lax.broadcasted_iota(jnp.uint32, (CT, 64), 1)
        ar = (pltpu.bitcast(iota_r * step_col, jnp.int32).astype(f32)
              * ang_scale)
        cr, sr = jnp.cos(ar), jnp.sin(ar)
        crt = pltpu.repeat(cr, A, axis=1)[:, :W]       # cr[:, k % 64]
        srt = pltpu.repeat(sr, A, axis=1)[:, :W]
        ex = expand_ref[:, :]
        cA = jnp.dot(ca, ex, preferred_element_type=f32)  # ca[:, k // 64]
        sA = jnp.dot(sa, ex, preferred_element_type=f32)
        lo_c = (cA * crt - sA * srt)[:, :blkp]
        lo_s = (sA * crt + cA * srt)[:, :blkp]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (CT, blkp), 1)
                < blk).astype(f32)
        bb_i = (xi * lo_c + xq * lo_s) * mask
        bb_q = (xq * lo_c - xi * lo_s) * mask
        ie = jnp.sum(e_rows * bb_i, axis=1, keepdims=True)  # [CT, 1]
        qe = jnp.sum(e_rows * bb_q, axis=1, keepdims=True)
        ip = jnp.sum(p_rows * bb_i, axis=1, keepdims=True)
        qp = jnp.sum(p_rows * bb_q, axis=1, keepdims=True)
        il = jnp.sum(l_rows * bb_i, axis=1, keepdims=True)
        ql = jnp.sum(l_rows * bb_q, axis=1, keepdims=True)

        # ---- Phase B: discriminators + loop filters on [CT, 1] columns --
        ip_prev = fstate[:, _F_IP_PREV:_F_IP_PREV + 1]
        qp_prev = fstate[:, _F_QP_PREV:_F_QP_PREV + 1]
        cross = ip * qp_prev - ip_prev * qp
        dot = jnp.abs(ip * ip_prev + qp * qp_prev)
        # dot >= 0, so atan2(cross, dot) == atan(cross/dot).
        freq_err = _atan(cross / jnp.maximum(dot, f32(1e-30))) \
            * f32(1.0 / np.pi)
        denom = jnp.where(jnp.abs(ip) < 1e-10, f32(1e-10), ip)
        carr_err = _atan(qp / denom) * f32(1.0 / (2.0 * np.pi))

        old_carr_err = fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1]
        carr_nco = (fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1]
                    + f32(k1) * carr_err - f32(k2) * old_carr_err
                    - f32(k3) * freq_err)
        doppler_basis = fstate[:, _F_DOPPLER_BASIS:_F_DOPPLER_BASIS + 1]
        inv_aid = fstate[:, _F_INV_AID:_F_INV_AID + 1]
        new_carr_delta = doppler_basis + carr_nco

        e_env = jnp.sqrt(ie * ie + qe * qe)
        l_env = jnp.sqrt(il * il + ql * ql)
        code_err = (e_env - l_env) / jnp.maximum(e_env + l_env, f32(1e-10))
        old_code_err = fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1]
        code_nco = (fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1]
                    + f32(c_dll_p) * (code_err - old_code_err)
                    + code_err * f32(c_dll_i))
        new_code_delta = -code_nco + new_carr_delta * inv_aid

        new_rem = rem + blk.astype(f32) * step - f32(code_length)

        fstate[:, _F_REM:_F_REM + 1] = new_rem
        fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1] = new_code_delta
        fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1] = new_carr_delta
        fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1] = carr_nco
        fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1] = carr_err
        fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1] = code_nco
        fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1] = code_err
        fstate[:, _F_IP_PREV:_F_IP_PREV + 1] = ip
        fstate[:, _F_QP_PREV:_F_QP_PREV + 1] = qp

        zero = jnp.zeros((CT, 1), f32)
        out_ref[0, :, :] = jnp.concatenate([
            ie, qe, ip, qp, il, ql, new_carr_delta, new_code_delta,
            new_rem, blk.astype(f32), code_err, code_nco, carr_err,
            carr_nco, zero, zero], axis=1)

        @pl.when(b == n_blocks - 1)
        def _():
            ffin_ref[:, :] = fstate[:, :]
            posfin = jnp.concatenate(
                [pos_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
            cphfin = pltpu.bitcast(jnp.concatenate(
                [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0),
                jnp.int32)
            ifin_ref[:, :] = jnp.concatenate(
                [posfin, cphfin, jnp.zeros((CT, NI - 2), jnp.int32)],
                axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "blkp", "code_length", "phases_per_chip",
                     "spacing", "span_chips", "base_code_step", "fs",
                     "coefs", "ct", "interpret"))
def track_chunk_fused(chunk_t, tab, pos0, finit, cinit, carrbase,
                      *, n_blocks: int, blkp: int, code_length: int,
                      phases_per_chip: int, spacing: float,
                      span_chips: float, base_code_step: float, fs: float,
                      coefs, ct: int = 8, interpret: bool = False):
    """Run the fused kernel. coefs = (k1, k2, k3, c_dll_p, c_dll_i).

    chunk_t [2, N] must have lane length >= max sample pos + blkp + 256
    (aligned window reads). tab: f32 [C, R, blkp] phase-row table built at
    span_chips (code_tables.prompt_row_table). spacing: E/L offset in
    CHIPS, realized at 1/phases_per_chip resolution (fractional; the
    reference's 0.05-0.4 chip design points, GPS/L1/initSettings.sci:91-98).
    Channels are processed in tiles of `ct` (channel count padded up).
    """
    C = pos0.shape[0]
    # Channel tile: multiple of 8 (f32 sublane tile) so per-tile block
    # offsets are Mosaic-legal; never larger than the padded channel count.
    CT = max(8, (ct // 8) * 8)
    CT = min(CT, -(-C // 8) * 8)
    Cp = -(-C // CT) * CT
    nct = Cp // CT
    k1, k2, k3, c_dll_p, c_dll_i = coefs
    kernel = _make_kernel(
        n_blocks=n_blocks, ct=CT, blkp=blkp,
        code_length=code_length, phases_per_chip=phases_per_chip,
        spacing=spacing, span_chips=span_chips,
        base_code_step=base_code_step, inv_fs=1.0 / fs,
        fs=fs, k1=k1, k2=k2, k3=k3, c_dll_p=c_dll_p, c_dll_i=c_dll_i)

    if Cp != C:
        padc = ((0, Cp - C),)
        pos0 = jnp.pad(pos0, padc, constant_values=2)
        cinit = jnp.pad(cinit.reshape(-1), padc)
        finit = jnp.pad(finit, padc + ((0, 0),))
        carrbase = jnp.pad(carrbase, padc + ((0, 0),))
        tab = jnp.pad(tab, padc + ((0, 0), (0, 0)))
    else:
        cinit = cinit.reshape(-1)

    # 0/1 expansion matrix for the factored LO (expand[a, k] = 1 iff
    # k // 64 == a); built once per (blkp, ct) shape and cached by jit.
    W = -(-blkp // 128) * 128
    A_pad = -(-(W // 64) // 8) * 8
    expand = (jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 1) // 64
              == jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 0)
              ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # pos0, cinit
        grid=(nct, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk_t (shared)
            pl.BlockSpec((CT, tab.shape[1], blkp),   # tab: per-tile slab
                         lambda t, b, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # finit
            pl.BlockSpec((CT, 1), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),   # carrbase
            pl.BlockSpec(memory_space=pltpu.VMEM),   # expand (shared)
        ],
        out_specs=(
            pl.BlockSpec((1, CT, NOUT), lambda t, b, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NI), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CT, NF), jnp.float32),       # fstate
            pltpu.SMEM((CT,), jnp.uint32),           # carrier phase
            pltpu.SMEM((CT,), jnp.int32),            # pos
            pltpu.SMEM((CT,), jnp.int32),            # blk
            pltpu.SMEM((CT,), jnp.uint32),           # cstep
            pltpu.SMEM((CT, 3), jnp.int32),          # E/P/L code rows
        ],
    )

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, Cp, NOUT), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NF), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NI), jnp.int32),
    )

    # VMEM budget: the resident chunk + two table slabs (Pallas
    # double-buffers the per-tile BlockSpec) + working set; the default
    # 16 MB scoped limit is far too small for second-long chunks.
    slab = CT * tab.shape[1] * blkp * 4
    vmem = int(chunk_t.size * 4 + 2 * slab + 8 * CT * blkp * 4 + 2 ** 21)
    out, ffin, ifin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 112 * 2 ** 20)),
    )(pos0, cinit, chunk_t, tab, finit, carrbase, expand)
    return (out[:, :C, :], ffin[:C], ifin[:C, I_POS],
            jax.lax.bitcast_convert_type(ifin[:C, I_CARR_PHASE],
                                         jnp.uint32))


# ---------------------------------------------------------------------------
# Dual-code (pilot + data) fused kernel — GLONASS L3OC production engine.
#
# Same architecture as the single-code kernel above with two differences
# forced by the L3 signal's scale (10230 chips / ms at 24 Msps ->
# blkp ~ 24002; a per-tile phase-row slab for TWO codes would be ~370 MB):
#   * the code-row table lives in HBM (memory_space ANY) as
#     [Cp, R, 8, blkp] with the six E/P/L x {pilot, data} tap waveforms
#     (padded to the 8-sublane tile) interleaved per phase row, and each
#     block DMAs ONE row per channel ([8, blkp], ~0.7 MB) into VMEM
#     scratch — issued before the LO
#     math so the copy hides behind compute;
#   * twelve accumulators and the L3 loop wiring (pilot-prompt Costas
#     PLL, flip-invariant 2-quadrant FLL, pilot-envelope DLL, /117.5
#     aiding — tracking/dual.py semantics, reference
#     GLONASS/L3/tracking.sci:312-396).
# ---------------------------------------------------------------------------

# Dual-kernel output lanes (acc order matches ops.dualcode.DualBlockOut).
(OD_IE, OD_QE, OD_IP, OD_QP, OD_IL, OD_QL,
 OD_IE2, OD_QE2, OD_IP2, OD_QP2, OD_IL2, OD_QL2,
 OD_CARR_DOPPLER, OD_CODE_FREQ_DELTA, OD_REM, OD_BLKSIZE,
 OD_DLL_DISC, OD_PLL_DISC) = range(18)
NOUT_D = 24


def _make_dual_kernel(*, n_blocks: int, ct: int, blkp: int,
                      code_length: int, phases_per_chip: int,
                      span_chips: float, base_code_step: float,
                      inv_fs: float, fs: float, k1: float, k2: float,
                      k3: float, c_dll_p: float, c_dll_i: float):
    CT = ct
    f32 = jnp.float32
    rows_total = int(round(2 * span_chips * phases_per_chip))
    ph_f = float(phases_per_chip)
    nco_scale = float(4294967296.0 / fs)
    wide = -(-(blkp + 128) // 128) * 128
    W = -(-blkp // 128) * 128
    A = W // 64
    A_pad = -(-A // 8) * 8

    BP = -(-blkp // 128) * 128          # DMA-tile-aligned row length

    def kernel(pos0_sm, cinit_sm, chunk_ref, tab_ref, finit_ref,
               carrbase_ref, expand_ref,
               out_ref, ffin_ref, ifin_ref,
               fstate, cphase_sm, pos_sm, blk_sm, cstep_sm, row_sm,
               rows_scr, dma_sem):
        ctile = pl.program_id(0)
        b = pl.program_id(1)
        c0 = ctile * CT
        slot = jax.lax.rem(b, 2)

        def row_dma(s, c):
            # Descriptor for channel c's tap-row copy into buffer s
            # (re-constructed identically at issue and wait sites).
            return pltpu.make_async_copy(
                tab_ref.at[c0 + c, row_sm[s, c]],   # [8, blkp] in HBM
                rows_scr.at[s, c],                  # [8, blkp] in VMEM
                dma_sem.at[s, c])

        @pl.when(b == 0)
        def _():
            fstate[:, :] = finit_ref[:, :]
            for c in range(CT):
                pos_sm[c] = pos0_sm[c0 + c]
                cphase_sm[c] = cinit_sm[c0 + c]

        # ---- Phase 0: block geometry [CT, 1] ----
        rem = fstate[:, _F_REM:_F_REM + 1]
        code_delta = fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1]
        carr_delta = fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1]
        step = f32(base_code_step) + code_delta * f32(inv_fs)
        blkf = jnp.ceil((f32(code_length) - rem) / step)
        blk = jnp.clip(blkf.astype(jnp.int32), 1, blkp)
        cstep = (carrbase_ref[:, 0:1]
                 + pltpu.bitcast(
                     jnp.round(carr_delta * f32(nco_scale)
                               ).astype(jnp.int32), jnp.uint32))
        for c in range(CT):
            blk_sm[c] = blk[c, 0]
            cstep_sm[c] = cstep[c, 0]

        # ---- Phase A. Tap rows are DOUBLE-BUFFERED one block ahead:
        # block b's rows were issued at the END of block b-1 (the next
        # rem — hence the next row index — is known after the loop
        # update), so the ~0.7 MB/channel HBM row copies hide behind a
        # full block of compute instead of only the LO math. Block 0
        # issues its own and eats the one-time wait. ----
        @pl.when(b == 0)
        def _():
            prow = jnp.round((rem + f32(span_chips)) * f32(ph_f))
            prow = jnp.clip(prow.astype(jnp.int32), 0, rows_total - 1)
            for c in range(CT):
                row_sm[0, c] = prow[c, 0]
            for c in range(CT):
                row_dma(0, c).start()

        wins = []
        for c in range(CT):
            pos = pos_sm[c]
            al = pl.multiple_of((pos // 128) * 128, 128)
            off = pos - al
            wins.append(pltpu.roll(chunk_ref[0:2, pl.ds(al, wide)],
                                   shift=wide - off, axis=1))
            pos_sm[c] = pos + blk_sm[c]
        xi = jnp.concatenate([w[0:1, :blkp] for w in wins], axis=0)
        xq = jnp.concatenate([w[1:2, :blkp] for w in wins], axis=0)

        ph_col = jnp.concatenate(
            [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        step_col = jnp.concatenate(
            [cstep_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        for c in range(CT):
            cphase_sm[c] = (cphase_sm[c]
                            + blk_sm[c].astype(jnp.uint32) * cstep_sm[c])

        ang_scale = f32(2.0 * np.pi / 4294967296.0)
        iota_a = jax.lax.broadcasted_iota(jnp.uint32, (CT, A_pad), 1)
        ka = ph_col + iota_a * (step_col * jnp.uint32(64))
        aa = pltpu.bitcast(ka, jnp.int32).astype(f32) * ang_scale
        ca, sa = jnp.cos(aa), jnp.sin(aa)
        iota_r = jax.lax.broadcasted_iota(jnp.uint32, (CT, 64), 1)
        ar = (pltpu.bitcast(iota_r * step_col, jnp.int32).astype(f32)
              * ang_scale)
        cr, sr = jnp.cos(ar), jnp.sin(ar)
        crt = pltpu.repeat(cr, A, axis=1)[:, :W]
        srt = pltpu.repeat(sr, A, axis=1)[:, :W]
        ex = expand_ref[:, :]
        cA = jnp.dot(ca, ex, preferred_element_type=f32)
        sA = jnp.dot(sa, ex, preferred_element_type=f32)
        lo_c = (cA * crt - sA * srt)[:, :blkp]
        lo_s = (sA * crt + cA * srt)[:, :blkp]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (CT, blkp), 1)
                < blk).astype(f32)
        bb_i = (xi * lo_c + xq * lo_s) * mask
        bb_q = (xq * lo_c - xi * lo_s) * mask

        for c in range(CT):
            row_dma(slot, c).wait()
        accs = []
        for j in range(6):
            rows_j = jnp.concatenate(
                [rows_scr[slot, c, j:j + 1, :blkp] for c in range(CT)],
                axis=0)
            accs.append(jnp.sum(rows_j * bb_i, axis=1, keepdims=True))
            accs.append(jnp.sum(rows_j * bb_q, axis=1, keepdims=True))
        (ie, qe, ip, qp, il, ql,
         ie2, qe2, ip2, qp2, il2, ql2) = accs

        # ---- Phase B: L3 dual loop wiring (tracking/dual.py) ----
        ip_prev = fstate[:, _F_IP_PREV:_F_IP_PREV + 1]
        qp_prev = fstate[:, _F_QP_PREV:_F_QP_PREV + 1]
        cross = ip * qp_prev - ip_prev * qp
        dot = ip * ip_prev + qp * qp_prev
        # Flip-invariant 2-quadrant FLL: atan2(cross*sign(dot), |dot|)
        # == atan(cross / dot) for dot of either sign.
        safe = jnp.where(jnp.abs(dot) < f32(1e-30),
                         jnp.where(dot < 0, f32(-1e-30), f32(1e-30)), dot)
        freq_err = _atan(cross / safe) * f32(1.0 / np.pi)
        denom = jnp.where(jnp.abs(ip) < 1e-10, f32(1e-10), ip)
        carr_err = _atan(qp / denom) * f32(1.0 / (2.0 * np.pi))

        old_carr_err = fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1]
        carr_nco = (fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1]
                    + f32(k1) * carr_err - f32(k2) * old_carr_err
                    - f32(k3) * freq_err)
        doppler_basis = fstate[:, _F_DOPPLER_BASIS:_F_DOPPLER_BASIS + 1]
        inv_aid = fstate[:, _F_INV_AID:_F_INV_AID + 1]
        new_carr_delta = doppler_basis + carr_nco

        e_env = jnp.sqrt(ie * ie + qe * qe)
        l_env = jnp.sqrt(il * il + ql * ql)
        code_err = (e_env - l_env) / jnp.maximum(e_env + l_env, f32(1e-10))
        old_code_err = fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1]
        code_nco = (fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1]
                    + f32(c_dll_p) * (code_err - old_code_err)
                    + code_err * f32(c_dll_i))
        new_code_delta = -code_nco + new_carr_delta * inv_aid

        new_rem = rem + blk.astype(f32) * step - f32(code_length)

        fstate[:, _F_REM:_F_REM + 1] = new_rem
        fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1] = new_code_delta
        fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1] = new_carr_delta
        fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1] = carr_nco
        fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1] = carr_err
        fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1] = code_nco
        fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1] = code_err
        fstate[:, _F_IP_PREV:_F_IP_PREV + 1] = ip
        fstate[:, _F_QP_PREV:_F_QP_PREV + 1] = qp

        # Prefetch: the NEXT block's rem is now known — select its tap
        # rows and launch their HBM copies into the other buffer so they
        # fly behind the whole of block b+1's LO/window compute.
        @pl.when(b < n_blocks - 1)
        def _():
            nslot = 1 - slot
            prow_n = jnp.round((new_rem + f32(span_chips)) * f32(ph_f))
            prow_n = jnp.clip(prow_n.astype(jnp.int32), 0, rows_total - 1)
            for c in range(CT):
                row_sm[nslot, c] = prow_n[c, 0]
            for c in range(CT):
                row_dma(nslot, c).start()

        zero = jnp.zeros((CT, 1), f32)
        out_ref[0, :, :] = jnp.concatenate([
            ie, qe, ip, qp, il, ql, ie2, qe2, ip2, qp2, il2, ql2,
            new_carr_delta, new_code_delta, new_rem, blk.astype(f32),
            code_err, carr_err] + [zero] * (NOUT_D - 18), axis=1)

        @pl.when(b == n_blocks - 1)
        def _():
            ffin_ref[:, :] = fstate[:, :]
            posfin = jnp.concatenate(
                [pos_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
            cphfin = pltpu.bitcast(jnp.concatenate(
                [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0),
                jnp.int32)
            ifin_ref[:, :] = jnp.concatenate(
                [posfin, cphfin, jnp.zeros((CT, NI - 2), jnp.int32)],
                axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "blkp", "code_length", "phases_per_chip",
                     "span_chips", "base_code_step", "fs", "coefs", "ct",
                     "interpret"))
def track_chunk_dual_fused(chunk_t, tab, pos0, finit, cinit, carrbase,
                           *, n_blocks: int, blkp: int, code_length: int,
                           phases_per_chip: int, span_chips: float,
                           base_code_step: float, fs: float, coefs,
                           ct: int = 8, interpret: bool = False):
    """Dual-code fused kernel. tab: f32 [C, R, 8, blkp] in HBM — phase
    rows with the 6 tap planes (pilot E/P/L, data E/P/L; E/L spacing
    baked into the planes by the table builder) padded to the 8-sublane
    tile. Other args as
    track_chunk_fused."""
    C = pos0.shape[0]
    CT = max(8, (ct // 8) * 8)
    CT = min(CT, -(-C // 8) * 8)
    Cp = -(-C // CT) * CT
    nct = Cp // CT
    k1, k2, k3, c_dll_p, c_dll_i = coefs
    kernel = _make_dual_kernel(
        n_blocks=n_blocks, ct=CT, blkp=blkp, code_length=code_length,
        phases_per_chip=phases_per_chip, span_chips=span_chips,
        base_code_step=base_code_step, inv_fs=1.0 / fs, fs=fs,
        k1=k1, k2=k2, k3=k3, c_dll_p=c_dll_p, c_dll_i=c_dll_i)

    if Cp != C:
        padc = ((0, Cp - C),)
        pos0 = jnp.pad(pos0, padc, constant_values=2)
        cinit = jnp.pad(cinit.reshape(-1), padc)
        finit = jnp.pad(finit, padc + ((0, 0),))
        carrbase = jnp.pad(carrbase, padc + ((0, 0),))
        tab = jnp.pad(tab, padc + ((0, 0), (0, 0), (0, 0)))
    else:
        cinit = cinit.reshape(-1)

    W = -(-blkp // 128) * 128
    A_pad = -(-(W // 64) // 8) * 8
    expand = (jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 1) // 64
              == jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 0)
              ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nct, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk_t (shared)
            pl.BlockSpec(memory_space=pl.ANY),    # tab (HBM, DMA'd)
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, 1), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # expand
        ],
        out_specs=(
            pl.BlockSpec((1, CT, NOUT_D), lambda t, b, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NI), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CT, NF), jnp.float32),       # fstate
            pltpu.SMEM((CT,), jnp.uint32),           # carrier phase
            pltpu.SMEM((CT,), jnp.int32),            # pos
            pltpu.SMEM((CT,), jnp.int32),            # blk
            pltpu.SMEM((CT,), jnp.uint32),           # cstep
            pltpu.SMEM((2, CT), jnp.int32),          # tap row per buffer
            pltpu.VMEM((2, CT, 8, -(-blkp // 128) * 128),
                       jnp.float32),             # double-buffered rows
            pltpu.SemaphoreType.DMA((2, CT)),
        ],
    )

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, Cp, NOUT_D), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NF), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NI), jnp.int32),
    )

    vmem = int(chunk_t.size * 4 + 4 * CT * 8 * blkp * 4
               + 10 * CT * blkp * 4 + 2 ** 21)
    out, ffin, ifin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 112 * 2 ** 20)),
    )(pos0, cinit, chunk_t, tab, finit, carrbase, expand)
    return (out[:, :C, :], ffin[:C], ifin[:C, I_POS],
            jax.lax.bitcast_convert_type(ifin[:C, I_CARR_PHASE],
                                         jnp.uint32))


# ---------------------------------------------------------------------------
# BOC double-estimator fused kernel — Galileo E1 production engine.
#
# Ten-correlator double-estimator (DLL + SLL + FLL-assisted PLL,
# reference GALILEO/E1/tracking.sci:300-430) in the dual-kernel mould:
# both the per-channel primary-code tap table ([Cp, Rc, 8, BP], E/P/L
# planes at +-code_spacing) and the SHARED meandr tap table
# ([Rs, 8, BP], E/P/L planes at +-sub_spacing in half-chips) live in HBM
# and each block DMAs one row of each per channel; the five
# (subcarrier, code) tap products form in VMEM. Two independent
# estimators = two phase states and two row indices per channel.
# ---------------------------------------------------------------------------

# Extra float-state lanes for the second (subcarrier) estimator.
_F_REM_SUB, _F_SUB_DELTA, _F_SLL_NCO, _F_OLD_SLL_ERR, _F_INV_AID_SUB = \
    range(11, 16)

# BOC output lanes (acc order matches ops.boc.BocBlockOut).
(OB_IEP, OB_QEP, OB_IPE, OB_QPE, OB_IPP, OB_QPP, OB_IPL, OB_QPL,
 OB_ILP, OB_QLP, OB_CARR_DOPPLER, OB_CODE_FREQ_DELTA, OB_SUB_FREQ_DELTA,
 OB_REM, OB_REM_SUB, OB_BLKSIZE, OB_DLL_DISC, OB_SLL_DISC,
 OB_PLL_DISC) = range(19)
NOUT_B = 24


def _make_boc_kernel(*, n_blocks: int, ct: int, blkp: int,
                     code_length: int, sub_length: int,
                     ph_code: int, ph_sub: int,
                     span_code: float, span_sub: float,
                     base_code_step: float, base_sub_step: float,
                     inv_fs: float, fs: float,
                     k1: float, k2: float, k3: float,
                     c_dll_p: float, c_dll_i: float,
                     c_sll_p: float, c_sll_i: float):
    CT = ct
    f32 = jnp.float32
    rows_c = int(round(2 * span_code * ph_code))
    rows_s = int(round(2 * span_sub * ph_sub))
    nco_scale = float(4294967296.0 / fs)
    wide = -(-(blkp + 128) // 128) * 128
    W = -(-blkp // 128) * 128
    A = W // 64
    A_pad = -(-A // 8) * 8

    def kernel(pos0_sm, cinit_sm, chunk_ref, ctab_ref, stab_ref,
               finit_ref, carrbase_ref, expand_ref,
               out_ref, ffin_ref, ifin_ref,
               fstate, cphase_sm, pos_sm, blk_sm, cstep_sm, crow_sm,
               srow_sm, crows_scr, srows_scr, csem, ssem):
        ctile = pl.program_id(0)
        b = pl.program_id(1)
        c0 = ctile * CT

        @pl.when(b == 0)
        def _():
            fstate[:, :] = finit_ref[:, :]
            for c in range(CT):
                pos_sm[c] = pos0_sm[c0 + c]
                cphase_sm[c] = cinit_sm[c0 + c]

        # ---- Phase 0: geometry + both estimators' row selection ----
        rem = fstate[:, _F_REM:_F_REM + 1]
        rem_s = fstate[:, _F_REM_SUB:_F_REM_SUB + 1]
        code_delta = fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1]
        sub_delta = fstate[:, _F_SUB_DELTA:_F_SUB_DELTA + 1]
        carr_delta = fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1]
        step_c = f32(base_code_step) + code_delta * f32(inv_fs)
        step_s = f32(base_sub_step) + sub_delta * f32(inv_fs)
        blkf = jnp.ceil((f32(code_length) - rem) / step_c)
        blk = jnp.clip(blkf.astype(jnp.int32), 1, blkp)
        cstep = (carrbase_ref[:, 0:1]
                 + pltpu.bitcast(
                     jnp.round(carr_delta * f32(nco_scale)
                               ).astype(jnp.int32), jnp.uint32))
        prow_c = jnp.round((rem + f32(span_code)) * f32(float(ph_code)))
        prow_c = jnp.clip(prow_c.astype(jnp.int32), 0, rows_c - 1)
        prow_s = jnp.round((rem_s + f32(span_sub)) * f32(float(ph_sub)))
        prow_s = jnp.clip(prow_s.astype(jnp.int32), 0, rows_s - 1)
        for c in range(CT):
            crow_sm[c] = prow_c[c, 0]
            srow_sm[c] = prow_s[c, 0]
            blk_sm[c] = blk[c, 0]
            cstep_sm[c] = cstep[c, 0]

        # ---- Phase A: start row DMAs, LO while they fly, correlate ----
        copies = []
        for c in range(CT):
            cp1 = pltpu.make_async_copy(
                ctab_ref.at[c0 + c, crow_sm[c]], crows_scr.at[c],
                csem.at[c])
            cp1.start()
            cp2 = pltpu.make_async_copy(
                stab_ref.at[srow_sm[c]], srows_scr.at[c],
                ssem.at[c])
            cp2.start()
            copies += [cp1, cp2]

        wins = []
        for c in range(CT):
            pos = pos_sm[c]
            al = pl.multiple_of((pos // 128) * 128, 128)
            off = pos - al
            wins.append(pltpu.roll(chunk_ref[0:2, pl.ds(al, wide)],
                                   shift=wide - off, axis=1))
            pos_sm[c] = pos + blk_sm[c]
        xi = jnp.concatenate([w[0:1, :blkp] for w in wins], axis=0)
        xq = jnp.concatenate([w[1:2, :blkp] for w in wins], axis=0)

        ph_col = jnp.concatenate(
            [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        step_col = jnp.concatenate(
            [cstep_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
        for c in range(CT):
            cphase_sm[c] = (cphase_sm[c]
                            + blk_sm[c].astype(jnp.uint32) * cstep_sm[c])

        ang_scale = f32(2.0 * np.pi / 4294967296.0)
        iota_a = jax.lax.broadcasted_iota(jnp.uint32, (CT, A_pad), 1)
        ka = ph_col + iota_a * (step_col * jnp.uint32(64))
        aa = pltpu.bitcast(ka, jnp.int32).astype(f32) * ang_scale
        ca, sa = jnp.cos(aa), jnp.sin(aa)
        iota_r = jax.lax.broadcasted_iota(jnp.uint32, (CT, 64), 1)
        ar = (pltpu.bitcast(iota_r * step_col, jnp.int32).astype(f32)
              * ang_scale)
        cr, sr = jnp.cos(ar), jnp.sin(ar)
        crt = pltpu.repeat(cr, A, axis=1)[:, :W]
        srt = pltpu.repeat(sr, A, axis=1)[:, :W]
        ex = expand_ref[:, :]
        cA = jnp.dot(ca, ex, preferred_element_type=f32)
        sA = jnp.dot(sa, ex, preferred_element_type=f32)
        lo_c = (cA * crt - sA * srt)[:, :blkp]
        lo_s = (sA * crt + cA * srt)[:, :blkp]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (CT, blkp), 1)
                < blk).astype(f32)
        bb_i = (xi * lo_c + xq * lo_s) * mask
        bb_q = (xq * lo_c - xi * lo_s) * mask

        for cp in copies:
            cp.wait()

        def rows(scr, j):
            return jnp.concatenate(
                [scr[c, j:j + 1, :blkp] for c in range(CT)], axis=0)

        code_e, code_p, code_l = (rows(crows_scr, j) for j in range(3))
        sub_e, sub_p, sub_l = (rows(srows_scr, j) for j in range(3))
        taps = [sub_e * code_p, sub_p * code_e, sub_p * code_p,
                sub_p * code_l, sub_l * code_p]
        accs = []
        for t in taps:
            accs.append(jnp.sum(t * bb_i, axis=1, keepdims=True))
            accs.append(jnp.sum(t * bb_q, axis=1, keepdims=True))
        (iep, qep, ipe, qpe, ipp, qpp, ipl, qpl, ilp, qlp) = accs

        # ---- Phase B: double-estimator loops (tracking/boc.py) ----
        ip_prev = fstate[:, _F_IP_PREV:_F_IP_PREV + 1]
        qp_prev = fstate[:, _F_QP_PREV:_F_QP_PREV + 1]
        cross = ipp * qp_prev - ip_prev * qpp
        dot = ipp * ip_prev + qpp * qp_prev
        safe = jnp.where(jnp.abs(dot) < f32(1e-30),
                         jnp.where(dot < 0, f32(-1e-30), f32(1e-30)), dot)
        freq_err = _atan(cross / safe) * f32(1.0 / np.pi)
        denom = jnp.where(jnp.abs(ipp) < 1e-10, f32(1e-10), ipp)
        carr_err = _atan(qpp / denom) * f32(1.0 / (2.0 * np.pi))
        old_carr_err = fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1]
        carr_nco = (fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1]
                    + f32(k1) * carr_err - f32(k2) * old_carr_err
                    - f32(k3) * freq_err)
        doppler_basis = fstate[:, _F_DOPPLER_BASIS:_F_DOPPLER_BASIS + 1]
        new_carr_delta = doppler_basis + carr_nco

        e_env = jnp.sqrt(ipe * ipe + qpe * qpe)
        l_env = jnp.sqrt(ipl * ipl + qpl * qpl)
        code_err = (e_env - l_env) / jnp.maximum(e_env + l_env, f32(1e-10))
        old_code_err = fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1]
        code_nco = (fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1]
                    + f32(c_dll_p) * (code_err - old_code_err)
                    + code_err * f32(c_dll_i))
        inv_aid = fstate[:, _F_INV_AID:_F_INV_AID + 1]
        new_code_delta = -code_nco + new_carr_delta * inv_aid

        se_env = jnp.sqrt(iep * iep + qep * qep)
        sl_env = jnp.sqrt(ilp * ilp + qlp * qlp)
        sll_err = (se_env - sl_env) / jnp.maximum(se_env + sl_env,
                                                  f32(1e-10))
        old_sll_err = fstate[:, _F_OLD_SLL_ERR:_F_OLD_SLL_ERR + 1]
        sll_nco = (fstate[:, _F_SLL_NCO:_F_SLL_NCO + 1]
                   + f32(c_sll_p) * (sll_err - old_sll_err)
                   + sll_err * f32(c_sll_i))
        inv_aid_sub = fstate[:, _F_INV_AID_SUB:_F_INV_AID_SUB + 1]
        new_sub_delta = -sll_nco + new_carr_delta * inv_aid_sub

        bsf = blk.astype(f32)
        new_rem = rem + bsf * step_c - f32(code_length)
        new_rem_s = rem_s + bsf * step_s - f32(sub_length)

        fstate[:, _F_REM:_F_REM + 1] = new_rem
        fstate[:, _F_REM_SUB:_F_REM_SUB + 1] = new_rem_s
        fstate[:, _F_CODE_DELTA:_F_CODE_DELTA + 1] = new_code_delta
        fstate[:, _F_SUB_DELTA:_F_SUB_DELTA + 1] = new_sub_delta
        fstate[:, _F_CARR_DELTA:_F_CARR_DELTA + 1] = new_carr_delta
        fstate[:, _F_CARR_NCO:_F_CARR_NCO + 1] = carr_nco
        fstate[:, _F_OLD_CARR_ERR:_F_OLD_CARR_ERR + 1] = carr_err
        fstate[:, _F_CODE_NCO:_F_CODE_NCO + 1] = code_nco
        fstate[:, _F_OLD_CODE_ERR:_F_OLD_CODE_ERR + 1] = code_err
        fstate[:, _F_SLL_NCO:_F_SLL_NCO + 1] = sll_nco
        fstate[:, _F_OLD_SLL_ERR:_F_OLD_SLL_ERR + 1] = sll_err
        fstate[:, _F_IP_PREV:_F_IP_PREV + 1] = ipp
        fstate[:, _F_QP_PREV:_F_QP_PREV + 1] = qpp

        zero = jnp.zeros((CT, 1), f32)
        out_ref[0, :, :] = jnp.concatenate([
            iep, qep, ipe, qpe, ipp, qpp, ipl, qpl, ilp, qlp,
            new_carr_delta, new_code_delta, new_sub_delta, new_rem,
            new_rem_s, bsf, code_err, sll_err, carr_err]
            + [zero] * (NOUT_B - 19), axis=1)

        @pl.when(b == n_blocks - 1)
        def _():
            ffin_ref[:, :] = fstate[:, :]
            posfin = jnp.concatenate(
                [pos_sm[c].reshape(1, 1) for c in range(CT)], axis=0)
            cphfin = pltpu.bitcast(jnp.concatenate(
                [cphase_sm[c].reshape(1, 1) for c in range(CT)], axis=0),
                jnp.int32)
            ifin_ref[:, :] = jnp.concatenate(
                [posfin, cphfin, jnp.zeros((CT, NI - 2), jnp.int32)],
                axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "blkp", "code_length", "sub_length",
                     "ph_code", "ph_sub", "span_code", "span_sub",
                     "base_code_step", "base_sub_step", "fs", "coefs",
                     "ct", "interpret"))
def track_chunk_boc_fused(chunk_t, ctab, stab, pos0, finit, cinit,
                          carrbase, *, n_blocks: int, blkp: int,
                          code_length: int, sub_length: int,
                          ph_code: int, ph_sub: int, span_code: float,
                          span_sub: float, base_code_step: float,
                          base_sub_step: float, fs: float, coefs,
                          ct: int = 8, interpret: bool = False):
    """BOC double-estimator fused kernel. ctab: f32 [C, Rc, 8, BP]
    per-channel primary-code tap rows (E/P/L planes, code_spacing baked);
    stab: f32 [Rs, 8, BP] shared meandr tap rows (sub_spacing baked).
    coefs = (k1, k2, k3, c_dll_p, c_dll_i, c_sll_p, c_sll_i)."""
    C = pos0.shape[0]
    CT = max(8, (ct // 8) * 8)
    CT = min(CT, -(-C // 8) * 8)
    Cp = -(-C // CT) * CT
    nct = Cp // CT
    k1, k2, k3, c_dll_p, c_dll_i, c_sll_p, c_sll_i = coefs
    kernel = _make_boc_kernel(
        n_blocks=n_blocks, ct=CT, blkp=blkp, code_length=code_length,
        sub_length=sub_length, ph_code=ph_code, ph_sub=ph_sub,
        span_code=span_code, span_sub=span_sub,
        base_code_step=base_code_step, base_sub_step=base_sub_step,
        inv_fs=1.0 / fs, fs=fs, k1=k1, k2=k2, k3=k3,
        c_dll_p=c_dll_p, c_dll_i=c_dll_i, c_sll_p=c_sll_p,
        c_sll_i=c_sll_i)

    if Cp != C:
        padc = ((0, Cp - C),)
        pos0 = jnp.pad(pos0, padc, constant_values=2)
        cinit = jnp.pad(cinit.reshape(-1), padc)
        finit = jnp.pad(finit, padc + ((0, 0),))
        carrbase = jnp.pad(carrbase, padc + ((0, 0),))
        ctab = jnp.pad(ctab, padc + ((0, 0), (0, 0), (0, 0)))
    else:
        cinit = cinit.reshape(-1)

    W = -(-blkp // 128) * 128
    A_pad = -(-(W // 64) // 8) * 8
    expand = (jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 1) // 64
              == jax.lax.broadcasted_iota(jnp.int32, (A_pad, W), 0)
              ).astype(jnp.float32)
    BP = -(-blkp // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nct, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk_t
            pl.BlockSpec(memory_space=pl.ANY),    # ctab (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # stab (HBM)
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, 1), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # expand
        ],
        out_specs=(
            pl.BlockSpec((1, CT, NOUT_B), lambda t, b, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NF), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NI), lambda t, b, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CT, NF), jnp.float32),       # fstate
            pltpu.SMEM((CT,), jnp.uint32),           # carrier phase
            pltpu.SMEM((CT,), jnp.int32),            # pos
            pltpu.SMEM((CT,), jnp.int32),            # blk
            pltpu.SMEM((CT,), jnp.uint32),           # cstep
            pltpu.SMEM((CT,), jnp.int32),            # code row
            pltpu.SMEM((CT,), jnp.int32),            # sub row
            pltpu.VMEM((CT, 8, BP), jnp.float32),    # code tap rows
            pltpu.VMEM((CT, 8, BP), jnp.float32),    # sub tap rows
            pltpu.SemaphoreType.DMA((CT,)),          # code-row DMAs
            pltpu.SemaphoreType.DMA((CT,)),          # sub-row DMAs
        ],
    )

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, Cp, NOUT_B), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NF), jnp.float32),
        jax.ShapeDtypeStruct((Cp, NI), jnp.int32),
    )

    vmem = int(chunk_t.size * 4 + 4 * CT * 8 * BP * 4
               + 12 * CT * blkp * 4 + 2 ** 21)
    out, ffin, ifin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 112 * 2 ** 20)),
    )(pos0, cinit, chunk_t, ctab, stab, finit, carrbase, expand)
    return (out[:, :C, :], ffin[:C], ifin[:C, I_POS],
            jax.lax.bitcast_convert_type(ifin[:C, I_CARR_PHASE],
                                         jnp.uint32))
