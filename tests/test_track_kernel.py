"""Fused Pallas tracking kernel vs XLA scan engine parity (interpret mode).

The fused kernel must reproduce the table-mode scan tracker's outputs and
state nearly bit-for-bit (same math, different reduction order only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import code_tables
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import scan as tscan
from gnsstpu.tracking.fused import make_fused_tracker

# fs = 2 samples/chip so the fused kernel's whole-sample E/L offset
# (1 sample) equals el_spacing = 0.5 chips exactly — the scan reference
# then samples identical code offsets.
SIG = SignalConfig(if_freq=0.0, fs=2.046e6, complex_iq=True)
TRK = TrackConfig(dll_bw=1.0, el_spacing=0.5)


def test_fused_matches_scan_table_mode():
    C = 4
    n_blocks = 12
    prns = [3, 9, 17, 25]
    sats = [SatParams(prn=p, doppler_hz=400.0 * i - 600.0,
                      code_phase_chips=50.0 * i + 11.0, cn0_dbhz=49.0)
            for i, p in enumerate(prns)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=4)
    chunk = jnp.asarray(sim.generate(n_blocks + 3))

    spc = SIG.samples_per_code
    tab = code_tables.phase_row_table(
        SIG.signal, SIG.fs, SIG.code_freq, SIG.code_length, spc + 2)
    codes_tab = jnp.asarray(np.stack([tab[p - 1] for p in prns]))
    ptab = code_tables.prompt_row_table(
        SIG.signal, SIG.fs, SIG.code_freq, SIG.code_length, spc + 2)
    prompt_tab = jnp.asarray(np.stack([ptab[p - 1] for p in prns]))
    cb, ia = tscan.channel_consts(SIG, TRK, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    spchip = SIG.fs / SIG.code_freq
    state0 = tscan.TrackState.init(
        np.array([int(round(s.code_phase_chips * spchip)) for s in sats]),
        np.array([s.doppler_hz + 37.0 for s in sats], np.float32))
    state0 = jax.tree.map(jnp.asarray, state0)

    ref_tracker = tscan.make_tracker(SIG, TRK, n_blocks=n_blocks,
                                     code_mode="table")
    ref_state, ref_out = ref_tracker(chunk, codes_tab, consts, state0)

    fused_tracker = make_fused_tracker(SIG, TRK, n_blocks=n_blocks,
                                       interpret=True)
    got_state, got_out = fused_tracker(chunk, prompt_tab, consts, state0)

    # Integer outputs exact.
    np.testing.assert_array_equal(np.asarray(got_out.blksize),
                                  np.asarray(ref_out.blksize))
    np.testing.assert_array_equal(
        np.asarray(got_state.corr.sample_pos),
        np.asarray(ref_state.corr.sample_pos))
    # Carrier NCO phase: identical up to a +-1 LSB step-rounding flip per
    # block (accumulator reduction-order noise can tip the f32->i32 NCO
    # step rounding on a boundary).
    dphase = (np.asarray(got_state.corr.carr_phase_u32).astype(np.int64)
              - np.asarray(ref_state.corr.carr_phase_u32).astype(np.int64))
    dphase = (dphase + 2 ** 31) % 2 ** 32 - 2 ** 31
    assert np.max(np.abs(dphase)) <= 4 * n_blocks * (SIG.samples_per_code
                                                     + 2)
    # Accumulators: f32 reduction order + the fused kernel's <=1-sample
    # roll wrap at E/L row ends (bounded by a few chips of amplitude).
    for name in ("ie", "qe", "ip", "qp", "il", "ql"):
        a = np.asarray(getattr(got_out, name))
        b = np.asarray(getattr(ref_out, name))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=25.0)
    # Loop-filter trajectories.
    np.testing.assert_allclose(np.asarray(got_out.carr_doppler),
                               np.asarray(ref_out.carr_doppler),
                               rtol=0, atol=0.05)
    np.testing.assert_allclose(np.asarray(got_out.rem_code_phase),
                               np.asarray(ref_out.rem_code_phase),
                               rtol=0, atol=5e-4)
