"""Adapter: fused Pallas kernel behind the scan-tracker interface.

make_fused_tracker() returns a track_chunk(chunk, codes_tab, consts, state)
with the same signature/pytrees as tracking.scan.make_tracker, so the host
driver and ChannelManager switch engines with code_mode="fused". This is
the PRODUCTION tracking engine (gnsstpu.runtime.manager defaults to it on
TPU); the XLA scan engine remains as the oracle for parity tests and as
the portable fallback.

E/L spacing is fractional: trk.el_spacing in chips, realized at
1/phases_per_chip chip resolution by fetching early/late phase-table rows
(reference design points 0.05-0.4 chip, GPS/L1/initSettings.sci:91-98).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import code_tables, track_kernel
from gnsstpu.tracking import loop_filters
from gnsstpu.tracking.scan import TrackOut, TrackState

PHASES_PER_CHIP = 64


def fused_span_chips(sig: SignalConfig, trk: TrackConfig,
                     phases_per_chip: int = PHASES_PER_CHIP) -> float:
    """Phase-row table half-span: must cover |rem_code_phase| (< one code
    step per sample) plus the E/L spacing plus rounding margin, quantized
    to whole 1/8-chip steps so cached tables are shared across nearby
    configs."""
    step = float(sig.code_freq) / float(sig.fs)      # chips per sample
    need = step + float(trk.el_spacing) + 2.0 / phases_per_chip + 0.0625
    return float(np.ceil(need * 8.0) / 8.0)


def fused_code_table(sig: SignalConfig, trk: TrackConfig,
                     prns=None, blkmax: int | None = None,
                     phases_per_chip: int = PHASES_PER_CHIP) -> np.ndarray:
    """Per-PRN phase-row table for the fused kernel, f32 [C, R, blkp].

    prns=None returns the full cached [num_prn, R, blkp] table.
    """
    blkp = blkmax or (sig.samples_per_code + 2)
    tab = code_tables.prompt_row_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length, blkp,
        phases_per_chip, span_chips=fused_span_chips(sig, trk,
                                                     phases_per_chip))
    if prns is None:
        return tab
    return np.stack([tab[p - 1] for p in prns])


def make_fused_tracker(sig: SignalConfig, trk: TrackConfig, *,
                       n_blocks: int, blkmax: int | None = None,
                       phases_per_chip: int = PHASES_PER_CHIP,
                       ct: int = 8, interpret: bool = False):
    spc = sig.samples_per_code
    blkp = blkmax or (spc + 2)
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw,
                                             trk.pdi)
    coefs = (float(k1), float(k2), float(k3),
             float(tau2 / tau1), float(trk.pdi / tau1))
    base_code_step = float(np.float64(sig.code_freq) / sig.fs)
    span = fused_span_chips(sig, trk, phases_per_chip)

    @jax.jit
    def track_chunk(chunk, codes_tab, consts, state: TrackState):
        carr_base, inv_aid = consts
        tk = track_kernel
        finit = jnp.stack([
            state.corr.rem_code_phase,
            state.corr.code_delta,
            state.corr.carr_delta,
            state.carr_nco,
            state.old_carr_err,
            state.code_nco,
            state.old_code_err,
            state.ip_prev,
            state.qp_prev,
            state.doppler_basis,
            inv_aid.astype(jnp.float32),
        ], axis=1)                                       # [C, 11]
        finit = jnp.pad(finit, ((0, 0), (0, tk.NF - finit.shape[1])))
        cinit = state.corr.carr_phase_u32
        pos0 = state.corr.sample_pos
        # Pad lanes so aligned+wide window reads stay in bounds.
        chunk_t = jnp.pad(chunk.T, ((0, 0), (0, 256)))
        out, ffin, posfin, cfin = tk.track_chunk_fused(
            chunk_t, codes_tab, pos0, finit, cinit,
            carr_base.astype(jnp.uint32)[:, None],
            n_blocks=n_blocks, blkp=blkp, code_length=sig.code_length,
            phases_per_chip=phases_per_chip,
            spacing=float(trk.el_spacing), span_chips=span,
            base_code_step=base_code_step,
            fs=float(sig.fs), coefs=coefs, ct=ct, interpret=interpret)
        new_state = TrackState(
            corr=state.corr._replace(
                rem_code_phase=ffin[:, tk._F_REM],
                carr_phase_u32=cfin,
                sample_pos=posfin,
                code_delta=ffin[:, tk._F_CODE_DELTA],
                carr_delta=ffin[:, tk._F_CARR_DELTA],
            ),
            doppler_basis=state.doppler_basis,
            carr_nco=ffin[:, tk._F_CARR_NCO],
            old_carr_err=ffin[:, tk._F_OLD_CARR_ERR],
            code_nco=ffin[:, tk._F_CODE_NCO],
            old_code_err=ffin[:, tk._F_OLD_CODE_ERR],
            ip_prev=ffin[:, tk._F_IP_PREV],
            qp_prev=ffin[:, tk._F_QP_PREV],
        )
        tout = TrackOut(
            ie=out[:, :, tk.O_IE], qe=out[:, :, tk.O_QE],
            ip=out[:, :, tk.O_IP], qp=out[:, :, tk.O_QP],
            il=out[:, :, tk.O_IL], ql=out[:, :, tk.O_QL],
            carr_doppler=out[:, :, tk.O_CARR_DOPPLER],
            code_freq_delta=out[:, :, tk.O_CODE_FREQ_DELTA],
            rem_code_phase=out[:, :, tk.O_REM],
            blksize=out[:, :, tk.O_BLKSIZE].astype(jnp.int32),
            dll_disc=out[:, :, tk.O_DLL_DISC],
            dll_disc_filt=out[:, :, tk.O_DLL_FILT],
            pll_disc=out[:, :, tk.O_PLL_DISC],
            pll_disc_filt=out[:, :, tk.O_PLL_FILT],
        )
        return new_state, tout

    return track_chunk
