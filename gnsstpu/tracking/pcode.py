"""Aperiodic-code tracking: GLONASS P ("VT") code closed loop.

The GLONASS P code is 5,110,000 chips at 5.11 Mcps — one full second per
period (signals.glonass.generate_p_code; reference
GLONASS/L2/include/generatePcode.sci:14-22, shipped but never tracked by
the reference's scripts). A per-ms tracking engine therefore cannot use
the periodic phase-row machinery (wrap at code_length): this tracker
keeps an ABSOLUTE chip offset as extra state and walks the code array
block by block — each 1 ms block correlates against chips
[chip_off, chip_off + 5110) fetched by gather from the device-resident
code span, with the same DLL / FLL-assisted-PLL structure as the scan
engine (tracking.sci:291-335 semantics).

Scope mirrors the ST-code engines: lax.scan over blocks, vmap-ready
(single channel here — GLONASS P is one code), exact uint32 carrier NCO.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import TrackConfig
from gnsstpu.ops import nco
from gnsstpu.tracking import loop_filters

P_CODE_FREQ = 5.11e6
BLOCK_CHIPS = 5110             # chips per 1 ms block


class PState(NamedTuple):
    rem: jax.Array             # f32 chips into the current block
    chip_off: jax.Array        # i32 absolute chip index of block start
    carr_phase_u32: jax.Array
    sample_pos: jax.Array      # i32 next unread sample
    code_delta: jax.Array      # f32 codeFreq - 5.11e6 [Hz]
    carr_delta: jax.Array      # f32 carrFreq - IF [Hz]
    doppler_basis: jax.Array
    carr_nco: jax.Array
    old_carr_err: jax.Array
    code_nco: jax.Array
    old_code_err: jax.Array
    ip_prev: jax.Array
    qp_prev: jax.Array

    @staticmethod
    def init(sample_pos: int, chip_off: int, doppler_hz: float,
             aid_div: float):
        f = jnp.float32
        z = f(0)
        return PState(
            rem=z, chip_off=jnp.int32(chip_off),
            carr_phase_u32=jnp.uint32(0),
            sample_pos=jnp.int32(sample_pos),
            code_delta=f(doppler_hz) / f(aid_div),
            carr_delta=f(doppler_hz),
            doppler_basis=f(doppler_hz), carr_nco=z, old_carr_err=z,
            code_nco=z, old_code_err=z,
            ip_prev=f(1e-3), qp_prev=f(1e-3))


def make_pcode_tracker(fs: float, if_freq: float, trk: TrackConfig, *,
                       n_blocks: int, aid_div: float):
    """Build track(chunk [N,2] f32, code ±1 f32 [n_chips], state) ->
    (state, outs dict of [n_blocks] arrays). aid_div = f_carrier / 5.11e6
    (carrier aiding divisor for this frequency channel)."""
    blkmax = int(np.ceil(fs * 1e-3)) + 2
    base_step = float(np.float64(P_CODE_FREQ) / fs)
    base_carr = nco.freq_to_step_u32(if_freq, fs)
    tau1, tau2 = loop_filters.dll_coeffs(trk.dll_bw, trk.dll_damping, 1.0)
    k1, k2, k3 = loop_filters.fll_pll_coeffs(trk.pll_bw, trk.fll_bw,
                                             trk.pdi)
    f32 = jnp.float32
    c_dll_p, c_dll_i = f32(tau2 / tau1), f32(trk.pdi / tau1)
    k1, k2, k3 = f32(k1), f32(k2), f32(k3)
    inv_aid = f32(1.0 / aid_div)
    spacing = float(trk.el_spacing)

    def one_block(chunk, code, st: PState):
        step = f32(base_step) + st.code_delta * f32(1.0 / fs)
        blkf = jnp.ceil((f32(BLOCK_CHIPS) - st.rem) / step)
        blk = jnp.clip(blkf.astype(jnp.int32), 1, blkmax)

        window = jax.lax.dynamic_slice(
            chunk, (st.sample_pos, jnp.int32(0)), (blkmax, 2))
        carr_step = (jnp.uint32(base_carr)
                     + nco.delta_freq_to_step_i32(st.carr_delta, fs)
                     .astype(jnp.uint32))
        phases, _ = nco.carrier_ramp_u32(st.carr_phase_u32, carr_step,
                                         blkmax)
        ang = nco.phase_u32_to_angle(phases)
        lo_c, lo_s = jnp.cos(ang), jnp.sin(ang)
        xr, xi = window[:, 0], window[:, 1]
        bb_i = xr * lo_c + xi * lo_s
        bb_q = xi * lo_c - xr * lo_s

        k = jnp.arange(blkmax, dtype=f32)
        mask = (jnp.arange(blkmax, dtype=jnp.int32) < blk).astype(f32)
        t_p = st.rem + k * step
        accs = []
        for off in (-spacing, 0.0, spacing):
            idx = st.chip_off + jnp.floor(t_p + f32(off)).astype(jnp.int32)
            idx = jnp.clip(idx, 0, code.shape[0] - 1)
            c = jnp.take(code, idx)
            accs.append((jnp.sum(c * bb_i * mask), jnp.sum(c * bb_q * mask)))
        (ie, qe), (ip, qp), (il, ql) = accs

        cross = ip * st.qp_prev - st.ip_prev * qp
        dot = ip * st.ip_prev + qp * st.qp_prev
        freq_err = jnp.arctan2(cross, jnp.abs(dot)) * f32(1.0 / np.pi)
        denom = jnp.where(jnp.abs(ip) < 1e-10, f32(1e-10), ip)
        carr_err = jnp.arctan(qp / denom) * f32(1.0 / (2.0 * np.pi))
        carr_nco = (st.carr_nco + k1 * carr_err - k2 * st.old_carr_err
                    - k3 * freq_err)
        carr_delta = st.doppler_basis + carr_nco

        e = jnp.sqrt(ie * ie + qe * qe)
        l = jnp.sqrt(il * il + ql * ql)
        code_err = (e - l) / jnp.maximum(e + l, f32(1e-10))
        code_nco = (st.code_nco + c_dll_p * (code_err - st.old_code_err)
                    + code_err * c_dll_i)
        code_delta = -code_nco + carr_delta * inv_aid

        new_rem = st.rem + blk.astype(f32) * step - f32(BLOCK_CHIPS)
        new = PState(
            rem=new_rem, chip_off=st.chip_off + BLOCK_CHIPS,
            carr_phase_u32=st.carr_phase_u32
            + blk.astype(jnp.uint32) * carr_step,
            sample_pos=st.sample_pos + blk,
            code_delta=code_delta, carr_delta=carr_delta,
            doppler_basis=st.doppler_basis, carr_nco=carr_nco,
            old_carr_err=carr_err, code_nco=code_nco,
            old_code_err=code_err, ip_prev=ip, qp_prev=qp)
        outs = {"ip": ip, "qp": qp, "ie": ie, "il": il,
                "carr_doppler": carr_delta, "code_err": code_err,
                "rem": new_rem, "blksize": blk}
        return new, outs

    @jax.jit
    def track(chunk, code, state):
        def step(st, _):
            return one_block(chunk, code, st)

        return jax.lax.scan(step, state, None, length=n_blocks)

    return track
