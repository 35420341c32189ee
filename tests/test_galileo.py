"""Galileo E1B tests: Viterbi codec, I/NAV page codec, BOC closed loop.

Mirrors the reference GALILEO/E1 receiver's verification points
(findPageStart sync + decode_gll_data deinterleave/Viterbi) with the
golden-fixture-by-construction strategy (SURVEY.md §4).
"""

import numpy as np
import pytest

from gnsstpu.config import AcqConfig, SignalConfig, TrackConfig
from gnsstpu.acquisition import acquire
from gnsstpu.acquisition.search import acq_samples_needed
from gnsstpu.nav import galileo as gal
from gnsstpu.nav import viterbi
from gnsstpu.runtime.sources import SimSource
from gnsstpu.signals import galileo_e1
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import ChannelInit
from gnsstpu.tracking.boc import track_boc

# fs deliberately non-commensurate with the chip rate (the reference
# front end is 16.3676 MHz, ~8.0002 samples/half-chip): an integer
# samples-per-half-chip lattice makes sub-sample E/L tap offsets
# degenerate (identical floor indices -> zero discriminator).
SIG = SignalConfig(signal="galileo_e1b", if_freq=0.0, fs=4.2e6,
                   code_freq=galileo_e1.SUB_FREQ,
                   code_length=galileo_e1.SUB_LENGTH)


def test_viterbi_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 114).astype(np.int8)
    syms = viterbi.conv_encode(bits)
    assert syms.shape == (240,)
    # Hard-decision decode, clean channel.
    dec = viterbi.viterbi_decode(1.0 - 2.0 * syms)
    assert np.array_equal(dec, bits)
    # Soft decode with Gaussian noise.
    soft = (1.0 - 2.0 * syms) + rng.normal(0, 0.6, 240)
    assert np.array_equal(viterbi.viterbi_decode(soft), bits)
    # A few hard symbol flips are corrected.
    lv = (1.0 - 2.0 * syms).astype(float)
    for k in (3, 77, 160):
        lv[k] *= -1
    assert np.array_equal(viterbi.viterbi_decode(lv), bits)


def test_viterbi_reference_polys():
    # The reference decoder's convention (decode_gll_data.sci:34-40):
    # polys (133, 171), no inversion.
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 60).astype(np.int8)
    polys, inv = (0o133, 0o171), (False, False)
    syms = viterbi.conv_encode(bits, polys=polys, invert=inv)
    dec = viterbi.viterbi_decode(1.0 - 2.0 * syms, polys=polys, invert=inv)
    assert np.array_equal(dec, bits)


def test_interleaver_inverse():
    x = np.arange(240)
    assert np.array_equal(gal.deinterleave(gal.interleave(x)), x)
    # Matches the reference mapping y[j*8+i] = x[i*30+j]
    # (decode_gll_data.sci:29-32, Scilab column-major reshape+transpose).
    y = gal.deinterleave(x)
    for i in range(8):
        for j in range(30):
            assert y[j * 8 + i] == x[i * 30 + j]


def make_galeph():
    return gal.GalileoEphemeris(
        IODnav=61, t_oe=351000.0, M_0=0.654321, e=2.5e-4, sqrtA=5440.588,
        omega_0=-1.0471975, i_0=0.9773844, omega=0.5235988,
        iDot=-1.8e-10, omegaDot=-5.6e-9, deltan=3.2e-9,
        C_uc=-8.5e-7, C_us=9.9e-6, C_rc=112.25, C_rs=-27.125,
        SVID=11, C_ic=3.7e-8, C_is=-5.6e-8, t_oc=351000.0,
        a_f0=-1.2e-4, a_f1=-7.9e-12, a_f2=0.0,
        ai0=40.0, ai1=0.15, ai2=0.002, BGD_E1E5a=2.3e-9, BGD_E1E5b=2.8e-9,
        WN=1042, TOW=351000,
    )


def test_inav_page_codec_roundtrip():
    eph = make_galeph()
    syms = gal.encode_frames(eph, tow0=351000, n_pages=5)
    assert syms.shape == (5 * 500,)
    start, pol = gal.find_page_start(syms * 900.0)
    assert start == 0 and pol == 1
    dec, tow = gal.decode_frames(syms * 900.0, 0)
    assert dec.valid and tow == 351000
    assert dec.IODnav == 61 and dec.SVID == 11 and dec.WN == 1042
    for f, lsb in [("M_0", 2.0 ** -31 * gal.GAL_PI), ("e", 2.0 ** -33),
                   ("sqrtA", 2.0 ** -19), ("t_oe", 60.0),
                   ("omega_0", 2.0 ** -31 * gal.GAL_PI),
                   ("omegaDot", 2.0 ** -43 * gal.GAL_PI),
                   ("deltan", 2.0 ** -43 * gal.GAL_PI),
                   ("C_rs", 2.0 ** -5), ("C_uc", 2.0 ** -29),
                   ("a_f0", 2.0 ** -34), ("a_f1", 2.0 ** -46),
                   ("BGD_E1E5b", 2.0 ** -32)]:
        want = round(getattr(eph, f) / lsb) * lsb
        assert getattr(dec, f) == pytest.approx(want, rel=1e-12,
                                                abs=1e-30), f


def test_inav_crc_rejects_corruption():
    eph = make_galeph()
    syms = gal.encode_frames(eph, tow0=0, n_pages=1)
    # Flip enough symbols inside the even part's data to defeat the FEC
    # (random burst), CRC must catch whatever the Viterbi emits.
    bad = syms.copy()
    rng = np.random.default_rng(3)
    idx = rng.choice(np.arange(10, 250), 60, replace=False)
    bad[idx] *= -1
    ok, word = gal.decode_page_pair(bad)
    assert not ok


def test_e1b_closed_loop():
    """Simulator -> acquisition -> double-estimator tracking -> I/NAV
    decode, bit-exact ephemeris recovery (the reference's golden-run
    strategy on a constructed fixture)."""
    eph = make_galeph()
    rng = np.random.default_rng(9)
    filler = rng.choice([-1.0, 1.0], 380)
    syms = np.concatenate([filler,
                           gal.encode_frames(eph, tow0=123456, n_pages=5)])
    sat = SatParams(prn=11, doppler_hz=1234.0, code_phase_chips=3210.5,
                    cn0_dbhz=48.0, nav_bits=syms)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=4)
    n_blocks = len(syms) + 4
    src = SimSource(sim, int((n_blocks + 4) * SIG.code_period_ms))

    acq = AcqConfig(doppler_band=4e3, coherent_ms=1, threshold=2.2,
                    doppler_step=75.0, prn_list=(11,))
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    assert 11 in res.detected_prns()
    # Code phase error <= 1 composite half-chip.
    spchip = SIG.fs / SIG.code_freq
    spc = SIG.samples_per_code
    expect = (sat.code_phase_chips * spchip) % spc
    err = (res.code_phase[10] - expect + spc / 2) % spc - spc / 2
    assert abs(err) <= 2 * spchip

    ch = ChannelInit(prn=11, code_phase=int(res.code_phase[10]),
                     doppler_hz=float(res.carr_freq[10]))
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0, fll_bw=50.0,
                      sll_bw=0.5, sll_spacing=0.25, aid_div=1540.0)
    tr = track_boc(src, [ch], SIG, trk, n_blocks, chunk_blocks=125)

    # Carrier converged to the true Doppler.
    assert abs(np.mean(tr.carr_freq[0, 800:]) - sat.doppler_hz) < 2.0
    # SLL locked: meandr rate consistent with code rate x2.
    assert abs(np.mean(tr.sub_freq[0, 800:] - 2 * tr.code_freq[0, 800:])) \
        < 0.5

    start, pol = gal.find_page_start(tr.i_pp[0, 300:])
    assert start >= 0
    dec, tow = gal.decode_frames(tr.i_pp[0, 300:], start)
    assert dec.valid
    assert dec.IODnav == 61 and dec.SVID == 11
    lsb = 2.0 ** -19
    assert dec.sqrtA == pytest.approx(round(eph.sqrtA / lsb) * lsb)
    # TOW of the first decoded page maps back to the symbol index.
    assert tow == 123456 + ((300 + start) - 380) // 250


# ---------------------------------------------------------------------------
# Galileo E1B position fix: double-estimator tracking -> I/NAV words 1-5
# -> GST pseudoranges -> GTRF Kepler -> LSQ.
# ---------------------------------------------------------------------------

GAL_RECV = np.array([3427947.0, 603774.0, 5326967.0])
GAL_TOW0 = 351000           # = t_oe
GAL_NPER = 3250             # 4 ms code periods (13 s)


def make_gal_constellation(n=5):
    from gnsstpu.nav import geodesy

    base = make_galeph()
    ephs = []
    for k in range(30):
        e = gal.GalileoEphemeris(**{**base.__dict__})
        e.M_0 = (base.M_0 + 2.7 * k) % (2 * np.pi) - np.pi
        e.omega_0 = (base.omega_0 + 1.7 * k) % (2 * np.pi) - np.pi
        e.i_0 = 0.95 + 0.03 * (k % 3)
        ephs.append(e)
    pos, _ = gal.satpos_gal(float(GAL_TOW0), ephs)
    _, el, _ = geodesy.topocent(GAL_RECV, pos - GAL_RECV)
    order = np.argsort(-el)[:n]
    assert el[order[-1]] > 15.0
    return {int(k) + 1: ephs[k] for k in order}


@pytest.fixture(scope="module")
def galileo_fix_output():
    from gnsstpu.config import NavConfig, ReceiverConfig
    from gnsstpu.runtime.receiver import run_receiver
    from gnsstpu.sim.scenario import build_scenario_galileo

    ephs = make_gal_constellation(5)
    sats, qephs = build_scenario_galileo(
        SIG, ephs, GAL_RECV, GAL_TOW0,
        duration_s=GAL_NPER * SIG.code_period_s,
        cn0_dbhz=48.0, n_pages=6)
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=23)
    src = SimSource(sim, int((GAL_NPER + 8) * SIG.code_period_ms))
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=9e3, coherent_ms=1, threshold=2.2,
                      doppler_step=75.0, prn_list=tuple(sorted(qephs))),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0,
                          fll_bw=50.0, sll_bw=0.5, sll_spacing=0.25,
                          aid_div=1540.0),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=5, ms_to_process=GAL_NPER)
    return qephs, run_receiver(src, cfg, n_ms=GAL_NPER)


def test_galileo_inav_decoded_bit_exact(galileo_fix_output):
    qephs, out = galileo_fix_output
    assert sorted(out.ephs) == sorted(qephs)
    for prn, dec in out.ephs.items():
        truth = qephs[prn]
        for f in ("sqrtA", "e", "M_0", "omega_0", "i_0", "t_oe", "a_f0",
                  "a_f1", "deltan", "omega", "IODnav"):
            assert getattr(dec, f) == getattr(truth, f), (prn, f)


def test_galileo_position_fix(galileo_fix_output):
    qephs, out = galileo_fix_output
    assert out.nav is not None, "no Galileo navigation solution"
    valid = out.nav.valid
    assert valid.sum() >= 8, f"only {valid.sum()} valid epochs"
    err3d = np.linalg.norm(np.stack(
        [out.nav.x[valid] - GAL_RECV[0], out.nav.y[valid] - GAL_RECV[1],
         out.nav.z[valid] - GAL_RECV[2]]), axis=0)
    assert np.mean(err3d) < 25.0, f"mean 3D error {np.mean(err3d):.1f} m"
    assert np.max(err3d) < 80.0, f"max 3D error {np.max(err3d):.1f} m"


def test_e1b_codes_are_real_icd_codes():
    """Default E1B primary codes must be the Galileo OS SIS ICD Annex C
    memory codes (reference ships the same table,
    GALILEO/E1/include/galileo-primary-code.txt via readE1Bcode.sci).
    First chips checked against the ICD hex (PRN1 starts 0xF5D71013:
    readE1Bcode.sci E1B(1))."""
    from gnsstpu.signals import galileo_e1 as e1

    first = {
        1: "111101011101011100010000",
        11: "101011111010011111111011",
        19: "101010111010011101011001",
    }
    for prn, bits in first.items():
        code = e1.primary_code(prn)
        want = (1 - 2 * np.array([int(b) for b in bits], np.int8))
        np.testing.assert_array_equal(code[:len(bits)], want)
        # ICD property: every E1B code is perfectly balanced.
        assert int(code.astype(np.int64).sum()) == 0
        assert len(code) == 4092


def test_e1c_pilot_codes_distinct_and_balanced():
    from gnsstpu.signals import galileo_e1 as e1

    seen = set()
    for prn in (1, 7, 33, 50):
        c = e1.pilot_code(prn)
        assert len(c) == 4092 and int(c.astype(np.int64).sum()) == 0
        assert not np.array_equal(c, e1.primary_code(prn))
        seen.add(c.tobytes())
    assert len(seen) == 4


def test_fused_boc_kernel_closed_loop_and_parity():
    """Production fused BOC double-estimator kernel (per-channel code tap
    table + shared meandr tap table in HBM, one row DMA of each per
    block): (a) closed loop from a real acquisition handoff — Doppler
    locks to truth with full prompt power; (b) parity vs the exact
    gather-mode scan BOC tracker where it is well-conditioned (identical
    block geometry; first-blocks accumulators at the 1/64-chip row
    quantization level — an unlocked BOC loop is chaotic, so long-horizon
    trajectory equality is not a meaningful check)."""
    import jax
    import jax.numpy as jnp

    from gnsstpu.ops import nco
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.tracking.boc import (BocTrackState, boc_fused_tables,
                                      make_boc_tracker,
                                      make_fused_boc_tracker)

    prn = 11
    rng = np.random.default_rng(9)
    syms = rng.choice([-1.0, 1.0], 400).astype(np.float64)
    sat = SatParams(prn=prn, doppler_hz=1234.0, code_phase_chips=3210.5,
                    cn0_dbhz=48.0, nav_bits=syms)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=4)
    n_blocks = 300
    src = SimSource(sim, int((n_blocks + 6) * SIG.code_period_ms))

    acq = AcqConfig(doppler_band=4e3, coherent_ms=1, threshold=2.2,
                    doppler_step=75.0, prn_list=(prn,))
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    assert prn in res.detected_prns()
    cp = int(res.code_phase[prn - 1])
    dopp0 = float(res.carr_freq[prn - 1])

    trk = TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0,
                      fll_bw=50.0, sll_bw=0.5, sll_spacing=0.25,
                      aid_div=1540.0)
    cb = jnp.asarray(np.array(
        [nco.freq_to_step_u32(SIG.if_freq, SIG.fs)], np.uint32))
    ctab, stab, _, _ = boc_fused_tables(SIG, trk, [prn])
    ctab, stab = jnp.asarray(ctab), jnp.asarray(stab)
    spc = SIG.samples_per_code

    # (a) closed loop, chunked like the production driver.
    CH = 100
    fused = make_fused_boc_tracker(SIG, trk, n_blocks=CH, interpret=True)
    state = jax.tree.map(jnp.asarray, BocTrackState.init(
        np.array([cp]), np.array([dopp0], np.float32)))
    abs_pos = float(cp)
    dopps, ipps = [], []
    for _ in range(n_blocks // CH):
        s0 = int(abs_pos)
        chunk = jnp.asarray(src.read(s0, CH * spc + spc + 64))
        state = state._replace(corr=state.corr._replace(
            sample_pos=jnp.asarray([int(round(abs_pos - s0))], jnp.int32)))
        state, out = fused(chunk, ctab, stab, cb, state)
        blk = np.asarray(out.acc.blksize)[:, 0].astype(np.float64)
        abs_pos = s0 + int(round(abs_pos - s0)) + blk.sum()
        dopps.append(np.asarray(out.carr_doppler)[:, 0])
        ipps.append(np.asarray(out.acc.i_pp)[:, 0])
    d = np.concatenate(dopps)
    ip = np.concatenate(ipps)
    assert abs(d[-50:].mean() - sat.doppler_hz) < 2.0
    assert np.abs(ip[-50:]).mean() > 0.08 * spc   # full prompt power

    # (b) parity vs the exact scan engine on the same handoff.
    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    from gnsstpu.signals import galileo_e1
    codes = jnp.asarray(pad(galileo_e1.primary_code(prn))[None])
    sub = jnp.asarray(pad(galileo_e1.subcarrier()))
    nb = 20
    chunk = jnp.asarray(src.read(cp, nb * spc + spc + 64))
    st0 = jax.tree.map(jnp.asarray, BocTrackState.init(
        np.array([0]), np.array([dopp0], np.float32)))
    rs, ro = make_boc_tracker(SIG, trk, n_blocks=nb)(
        chunk, codes, sub, cb, st0)
    pf = make_fused_boc_tracker(SIG, trk, n_blocks=nb, interpret=True)
    gs, go = pf(chunk, ctab, stab, cb, st0)
    np.testing.assert_array_equal(np.asarray(go.acc.blksize),
                                  np.asarray(ro.acc.blksize))
    np.testing.assert_array_equal(np.asarray(gs.corr.sample_pos),
                                  np.asarray(rs.corr.sample_pos))
    # Prompt taps at the few-percent level; off-prompt taps (E/L of a
    # +-1 subcarrier at twice the chip rate) are the most sensitive to
    # the 1/64-chip row grid, so they get a wider band.
    for fld, tol in (("i_pp", 0.05), ("q_pp", 0.05),
                     ("i_pe", 0.15), ("i_lp", 0.15)):
        a = np.asarray(getattr(go.acc, fld))[:5]
        b = np.asarray(getattr(ro.acc, fld))[:5]
        assert np.max(np.abs(a - b)) < tol * max(np.abs(
            np.asarray(getattr(ro.acc, fld))).max(), 1.0), fld


def test_fused_boc_locked_loop_long_horizon_parity():
    """VERDICT r2 item 8: from a CONVERGED state, the fused BOC kernel
    and the exact scan BOC tracker must agree over a long horizon (the
    standard test_fused_dual_kernel_matches_scan_dual sets). A locked
    double-estimator is a stable system, so the fused path's 1/64-chip
    row quantization must stay a bounded perturbation — not diverge —
    across 200 blocks (0.8 s)."""
    import jax
    import jax.numpy as jnp

    from gnsstpu.ops import nco
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.tracking.boc import (BocTrackState, boc_fused_tables,
                                      make_boc_tracker,
                                      make_fused_boc_tracker)

    prn = 11
    rng = np.random.default_rng(9)
    syms = rng.choice([-1.0, 1.0], 360).astype(np.float64)
    sat = SatParams(prn=prn, doppler_hz=1234.0, code_phase_chips=3210.5,
                    cn0_dbhz=48.0, nav_bits=syms)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=4)
    warm, horizon = 120, 200
    src = SimSource(sim, int((warm + horizon + 8) * SIG.code_period_ms))

    acq = AcqConfig(doppler_band=4e3, coherent_ms=1, threshold=2.2,
                    doppler_step=75.0, prn_list=(prn,))
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    cp = int(res.code_phase[prn - 1])
    dopp0 = float(res.carr_freq[prn - 1])
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0,
                      fll_bw=50.0, sll_bw=0.5, sll_spacing=0.25,
                      aid_div=1540.0)
    cb = jnp.asarray(np.array(
        [nco.freq_to_step_u32(SIG.if_freq, SIG.fs)], np.uint32))
    spc = SIG.samples_per_code

    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    codes = jnp.asarray(pad(galileo_e1.primary_code(prn))[None])
    sub = jnp.asarray(pad(galileo_e1.subcarrier()))

    # Converge with the exact engine.
    warm_trk = make_boc_tracker(SIG, trk, n_blocks=warm)
    st0 = jax.tree.map(jnp.asarray, BocTrackState.init(
        np.array([cp]), np.array([dopp0], np.float32)))
    chunk_w = jnp.asarray(src.read(cp, warm * spc + spc + 64))
    st0 = st0._replace(corr=st0.corr._replace(
        sample_pos=jnp.zeros(1, jnp.int32)))
    st_conv, ow = warm_trk(chunk_w, codes, sub, cb, st0)
    assert abs(float(np.asarray(ow.carr_doppler)[-1, 0]) - 1234.0) < 3.0

    # From the SAME converged state, run both engines over the horizon.
    pos0 = cp + int(np.asarray(ow.acc.blksize).sum())
    chunk_h = jnp.asarray(src.read(pos0, horizon * spc + spc + 64))
    st_conv = st_conv._replace(corr=st_conv.corr._replace(
        sample_pos=jnp.zeros(1, jnp.int32)))
    scan_trk = make_boc_tracker(SIG, trk, n_blocks=horizon)
    _, r = scan_trk(chunk_h, codes, sub, cb, st_conv)

    ctab, stab, _, _ = boc_fused_tables(SIG, trk, [prn])
    fused = make_fused_boc_tracker(SIG, trk, n_blocks=horizon,
                                   interpret=True)
    _, g = fused(chunk_h, jnp.asarray(ctab), jnp.asarray(stab), cb,
                 st_conv)

    # Near-identical block geometry over the whole horizon (the fused
    # path's quantized rem may flip a ceil boundary by one sample on
    # rare blocks; cumulative drift must stay bounded)...
    bg = np.asarray(g.acc.blksize).astype(np.int64)
    br = np.asarray(r.acc.blksize).astype(np.int64)
    assert np.abs(bg - br).max() <= 1
    assert np.abs(np.cumsum(bg - br)).max() <= 2
    # ...carrier trajectory within PLL-jitter-level agreement...
    np.testing.assert_allclose(np.asarray(g.carr_doppler),
                               np.asarray(r.carr_doppler), atol=2.0)
    # ...absolute code phase (consumed samples minus the remainder in
    # samples — invariant to single-sample block-boundary flips) within
    # a few 1/64-chip quantization steps...
    spchip = SIG.fs / (SIG.code_freq / 2.0)
    abs_g = np.cumsum(bg, 0) - np.asarray(g.acc.rem_code_phase) * spchip
    abs_r = np.cumsum(br, 0) - np.asarray(r.acc.rem_code_phase) * spchip
    np.testing.assert_allclose(abs_g, abs_r, atol=6.0 / 64.0 * spchip)
    # ...and full prompt power all the way (no slow unlock).
    pp_g = np.hypot(np.asarray(g.acc.i_pp), np.asarray(g.acc.q_pp))
    pp_r = np.hypot(np.asarray(r.acc.i_pp), np.asarray(r.acc.q_pp))
    assert pp_g[-50:].mean() > 0.9 * pp_r[-50:].mean()


def test_ambiguous_boc_tracker_alternative():
    """The reference's BOC tracking ALTERNATIVE
    (GALILEO/E1/BOC_tracking_alternatives/: track the composite BOC(1,1)
    autocorrelation directly — simpler, but the sharp +-half-cycle
    ambiguous peak): in this framework that is simply the standard scan
    engine run on the composite code table, no special machinery. The
    production path remains the unambiguous double-estimator
    (tracking.boc); this covers the alternative's scope."""
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.tracking import ChannelInit
    from gnsstpu.tracking.driver import track

    rng = np.random.default_rng(9)
    syms = rng.choice([-1.0, 1.0], 200)
    sat = SatParams(prn=11, doppler_hz=1234.0, code_phase_chips=3210.5,
                    cn0_dbhz=48.0, nav_bits=syms)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=4)
    src = SimSource(sim, int(206 * SIG.code_period_ms))
    acq = AcqConfig(doppler_band=4e3, coherent_ms=1, threshold=2.2,
                    doppler_step=75.0, prn_list=(11,))
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    assert 11 in res.detected_prns()
    ch = ChannelInit(prn=11, code_phase=int(res.code_phase[10]),
                     doppler_hz=float(res.carr_freq[10]))
    # Composite clock: pdi = 4 ms code period; aiding at the meandr
    # rate (f_carr / 2.046 MHz = 770).
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.3, pll_bw=15.0,
                      fll_bw=50.0, pdi=SIG.code_period_s, aid_div=770.0)
    tr = track(src, [ch], SIG, trk, n_ms=200, chunk_ms=100,
               code_mode="gather")
    assert abs(np.mean(tr.carr_freq[0, 150:]) - 1234.0) < 2.0
    pp = np.hypot(tr.i_p[0], tr.q_p[0])
    assert pp[150:].mean() > 1.3 * pp[:10].mean()   # pulled in, locked
