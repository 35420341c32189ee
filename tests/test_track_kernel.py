"""Fused Pallas tracking kernel vs XLA scan engine parity (interpret mode).

The fused kernel must reproduce the table-mode scan tracker's outputs and
state nearly bit-for-bit: same phase-row quantization (1/64 chip), same
fractional E/L spacing row selection, same loop-filter math — only f32
reduction order differs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.ops import code_tables
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import scan as tscan
from gnsstpu.tracking.fused import fused_code_table, make_fused_tracker

# Non-integral samples/chip + fractional E/L spacing: the fused kernel's
# phase-row fetch must realize 0.3-chip spacing (the reference's design
# range is 0.05-0.4 chip, GPS/L1/initSettings.sci:91-98), which the old
# whole-sample-roll kernel could not.
SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
TRK = TrackConfig(dll_bw=1.0, el_spacing=0.3)


def _setup(C, n_blocks, trk):
    prns = [3, 9, 17, 25, 5, 12, 22, 28, 31, 7][:C]
    sats = [SatParams(prn=p, doppler_hz=400.0 * i - 600.0,
                      code_phase_chips=50.0 * i + 11.0, cn0_dbhz=49.0)
            for i, p in enumerate(prns)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=4)
    chunk = jnp.asarray(sim.generate(n_blocks + 3))

    spc = SIG.samples_per_code
    tab = code_tables.phase_row_table(
        SIG.signal, SIG.fs, SIG.code_freq, SIG.code_length, spc + 2)
    codes_tab = jnp.asarray(np.stack([tab[p - 1] for p in prns]))
    fused_tab = jnp.asarray(fused_code_table(SIG, trk, prns))
    cb, ia = tscan.channel_consts(SIG, trk, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    spchip = SIG.fs / SIG.code_freq
    state0 = tscan.TrackState.init(
        np.array([int(round(s.code_phase_chips * spchip)) for s in sats]),
        np.array([s.doppler_hz + 37.0 for s in sats], np.float32))
    state0 = jax.tree.map(jnp.asarray, state0)
    return chunk, codes_tab, fused_tab, consts, state0


def test_fused_matches_scan_table_mode():
    C, n_blocks = 4, 12
    chunk, codes_tab, fused_tab, consts, state0 = _setup(C, n_blocks, TRK)

    ref_tracker = tscan.make_tracker(SIG, TRK, n_blocks=n_blocks,
                                     code_mode="table")
    ref_state, ref_out = ref_tracker(chunk, codes_tab, consts, state0)

    fused_tracker = make_fused_tracker(SIG, TRK, n_blocks=n_blocks,
                                       interpret=True)
    got_state, got_out = fused_tracker(chunk, fused_tab, consts, state0)

    # Integer outputs exact: both engines select identical phase-table
    # rows (same 1/64-chip grid, same rounding), so block geometry agrees.
    np.testing.assert_array_equal(np.asarray(got_out.blksize),
                                  np.asarray(ref_out.blksize))
    np.testing.assert_array_equal(
        np.asarray(got_state.corr.sample_pos),
        np.asarray(ref_state.corr.sample_pos))
    # Carrier NCO phase: identical up to +-1 LSB step-rounding flips per
    # block (accumulator reduction-order noise can tip the f32->i32 NCO
    # step rounding on a boundary).
    dphase = (np.asarray(got_state.corr.carr_phase_u32).astype(np.int64)
              - np.asarray(ref_state.corr.carr_phase_u32).astype(np.int64))
    dphase = (dphase + 2 ** 31) % 2 ** 32 - 2 ** 31
    assert np.max(np.abs(dphase)) <= 4 * n_blocks * (SIG.samples_per_code
                                                     + 2)
    # Accumulators: identical code rows and windows, so only f32
    # reduction order (matmul vs elementwise-sum) separates them.
    for name in ("ie", "qe", "ip", "qp", "il", "ql"):
        a = np.asarray(getattr(got_out, name))
        b = np.asarray(getattr(ref_out, name))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2.0)
    # Loop-filter trajectories.
    np.testing.assert_allclose(np.asarray(got_out.carr_doppler),
                               np.asarray(ref_out.carr_doppler),
                               rtol=0, atol=0.05)
    np.testing.assert_allclose(np.asarray(got_out.rem_code_phase),
                               np.asarray(ref_out.rem_code_phase),
                               rtol=0, atol=5e-4)


def test_fused_channel_tiling_padding():
    """C spanning two channel tiles (9 channels, tile 8 -> padded 16):
    every tile must see its own table slab and state rows, and the pad
    channels must not perturb real ones."""
    C, n_blocks = 9, 6
    chunk, codes_tab, fused_tab, consts, state0 = _setup(C, n_blocks, TRK)

    ref_tracker = tscan.make_tracker(SIG, TRK, n_blocks=n_blocks,
                                     code_mode="table")
    ref_state, ref_out = ref_tracker(chunk, codes_tab, consts, state0)

    tiled = make_fused_tracker(SIG, TRK, n_blocks=n_blocks, ct=8,
                               interpret=True)
    st_b, out_b = tiled(chunk, fused_tab, consts, state0)

    np.testing.assert_array_equal(np.asarray(ref_out.blksize),
                                  np.asarray(out_b.blksize))
    np.testing.assert_allclose(np.asarray(ref_out.ip), np.asarray(out_b.ip),
                               rtol=2e-3, atol=2.0)
    np.testing.assert_array_equal(np.asarray(ref_state.corr.sample_pos),
                                  np.asarray(st_b.corr.sample_pos))
