"""Adapter: fused Pallas kernel behind the scan-tracker interface.

make_fused_tracker() returns a track_chunk(chunk, codes_tab, consts, state)
with the same signature/pytrees as tracking.scan.make_tracker, so the host
driver switches engines with code_mode="fused".
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import track_kernel
from gnsstpu.tracking import loop_filters
from gnsstpu.tracking.scan import TrackOut, TrackState


SPAN_CHIPS = 0.75


def el_offset_samples(sig: SignalConfig, trk: TrackConfig) -> int:
    """E/L offset in whole samples for the fused kernel (>= 1); the
    effective correlator spacing is this times code chips per sample."""
    return max(1, round(trk.el_spacing * sig.fs / sig.code_freq))


def make_fused_tracker(sig: SignalConfig, trk: TrackConfig, *,
                       n_blocks: int, blkmax: int | None = None,
                       phases_per_chip: int = 64, interpret: bool = False):
    spc = sig.samples_per_code
    blkp = blkmax or (spc + 2)
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw,
                                             trk.pdi)
    coefs = (float(k1), float(k2), float(k3),
             float(tau2 / tau1), float(trk.pdi / tau1))
    base_code_step = float(np.float64(sig.code_freq) / sig.fs)
    d = el_offset_samples(sig, trk)

    @jax.jit
    def track_chunk(chunk, codes_tab, consts, state: TrackState):
        carr_base, inv_aid = consts
        C = carr_base.shape[0]
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
        ])                                               # [NF, C]
        cinit = state.corr.carr_phase_u32[None, :]
        pos0 = state.corr.sample_pos
        cvec = jnp.stack([state.doppler_basis, inv_aid])  # [2, C]
        # Pad lanes so aligned+wide window reads stay in bounds.
        chunk_t = jnp.pad(chunk.T, ((0, 0), (0, 256)))
        out, ffin, cfin, posfin = tk.track_chunk_fused(
            chunk_t, codes_tab, pos0, finit, cinit, cvec,
            carr_base[None, :].astype(jnp.uint32),
            n_blocks=n_blocks, blkp=blkp, code_length=sig.code_length,
            phases_per_chip=phases_per_chip, d_samples=d,
            span_chips=SPAN_CHIPS, base_code_step=base_code_step,
            fs=float(sig.fs), coefs=coefs, interpret=interpret)
        new_state = TrackState(
            corr=state.corr._replace(
                rem_code_phase=ffin[tk._F_REM],
                carr_phase_u32=cfin[0],
                sample_pos=posfin[0],
                code_delta=ffin[tk._F_CODE_DELTA],
                carr_delta=ffin[tk._F_CARR_DELTA],
            ),
            doppler_basis=state.doppler_basis,
            carr_nco=ffin[tk._F_CARR_NCO],
            old_carr_err=ffin[tk._F_OLD_CARR_ERR],
            code_nco=ffin[tk._F_CODE_NCO],
            old_code_err=ffin[tk._F_OLD_CODE_ERR],
            ip_prev=ffin[tk._F_IP_PREV],
            qp_prev=ffin[tk._F_QP_PREV],
        )
        tout = TrackOut(
            ie=out[:, tk.O_IE, :], qe=out[:, tk.O_QE, :],
            ip=out[:, tk.O_IP, :], qp=out[:, tk.O_QP, :],
            il=out[:, tk.O_IL, :], ql=out[:, tk.O_QL, :],
            carr_doppler=out[:, tk.O_CARR_DOPPLER, :],
            code_freq_delta=out[:, tk.O_CODE_FREQ_DELTA, :],
            rem_code_phase=out[:, tk.O_REM, :],
            blksize=out[:, tk.O_BLKSIZE, :].astype(jnp.int32),
            dll_disc=out[:, tk.O_DLL_DISC, :],
            dll_disc_filt=out[:, tk.O_DLL_FILT, :],
            pll_disc=out[:, tk.O_PLL_DISC, :],
            pll_disc_filt=out[:, tk.O_PLL_FILT, :],
        )
        return new_state, tout

    return track_chunk
