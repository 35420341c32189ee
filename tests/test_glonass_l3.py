"""GLONASS L3OC CDMA tests: codes, overlay/Viterbi codec, dual-component
closed loop.

Fixture-by-construction strategy (SURVEY.md §4): the simulator plays the
role of the reference's glonass_l3_generator.sce (data+pilot quadrature
pair with NH(10)/Barker(5) overlays, Doppler + Doppler-rate), and the
receiver chain must get the data bits back exactly.
"""

import numpy as np

from gnsstpu.acquisition import acquire
from gnsstpu.acquisition.search import acq_samples_needed
from gnsstpu.config import AcqConfig, SignalConfig, TrackConfig
from gnsstpu.nav import glonass_l3 as l3nav
from gnsstpu.nav.viterbi import conv_encode
from gnsstpu.runtime.sources import SimSource
from gnsstpu.signals import glonass_l3
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import ChannelInit
from gnsstpu.tracking.dual import track_dual

# Reference front end (GLONASS/L3/initSettings.sci:69-75): fs = 24 MHz,
# IF = -2.025 MHz, 10230 chips @ 10.23 Mcps.
SIG = SignalConfig(signal="glonass_l3oc", if_freq=-2.025e6, fs=24.0e6,
                   code_freq=glonass_l3.CODE_FREQ,
                   code_length=glonass_l3.CODE_LENGTH)


def test_l3_code_properties():
    c30 = glonass_l3.generate_l3_code(30)
    assert c30.shape == (10230,)
    assert set(np.unique(c30)) <= {-1, 1}
    # Pilot/data pair are distinct, low-cross-correlation sequences.
    c62 = glonass_l3.generate_l3_code(62)
    assert np.any(c30 != c62)
    xc = abs(int(np.dot(c30.astype(int), c62.astype(int))))
    assert xc < 0.1 * 10230
    # Codes are near-balanced (m-sequence product structure).
    assert abs(int(c30.astype(int).sum())) < 300
    # Distinct PRNs differ.
    assert np.any(glonass_l3.generate_l3_code(1)
                  != glonass_l3.generate_l3_code(2))


def overlay_streams(bits, n_ms):
    """Per-ms pilot and data overlay levels (the simulator nav_bits).

    The encoded codeword repeats cyclically; its length in ms is
    10 * (len(bits) + 6) (rate 1/2, 5 ms per symbol).
    """
    sym = 1.0 - 2.0 * conv_encode(bits, polys=l3nav.L3_POLYS,
                                  invert=l3nav.L3_INVERT)   # 200 sps
    cycle_sym = len(sym)
    n_sym = int(np.ceil(n_ms / 5))
    sym_t = np.resize(sym, n_sym)
    pilot = np.resize(glonass_l3.NH10.astype(np.float32), n_ms)
    data = (np.repeat(sym_t, 5)[:n_ms]
            * np.resize(glonass_l3.BARKER5.astype(np.float32), n_ms))
    return pilot, data, cycle_sym


def test_overlay_sync_and_decode_roundtrip():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 14).astype(np.int8)   # codeword = 200 ms
    n_ms = 600
    pilot, data, _ = overlay_streams(bits, n_ms)
    # Emulate tracked prompts starting mid-NH-period with a 180-degree
    # Costas flip: the stream begins at overlay index `off`.
    off = 7
    amp = 900.0
    p_ip = -amp * pilot[off:]
    d_ip = -amp * data[off:]
    sync = l3nav.sync_overlay(p_ip)
    assert sync.found
    assert sync.polarity == -1
    # first_ms points at the next NH epoch: off + first_ms = multiple of 10.
    assert (off + sync.first_ms) % 10 == 0
    # Decode from the first full codeword boundary in the sliced stream.
    cw_ms = 10 * (len(bits) + 6)
    start = ((-off) % cw_ms)
    sync2 = l3nav.L3OverlaySync(True, first_ms=start, polarity=-1)
    dec = l3nav.decode_data(d_ip, sync2, n_bits=len(bits))
    assert np.array_equal(dec[: len(bits)], bits)


def test_l3oc_closed_loop():
    """Sim (data+pilot quadrature, Doppler rate) -> pilot acquisition ->
    dual tracking -> overlay sync -> Viterbi: bit-exact data recovery."""
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 12).astype(np.int8)
    n_ms = 620
    pilot_ov, data_ov, cycle_sym = overlay_streams(bits, n_ms + 40)

    prn = 30
    # Reference simulator scenario values (glonass_l3_generator.sce:33-34):
    # f_d = 2800 Hz, df = -0.55 Hz/s.
    common = dict(doppler_hz=2800.0, doppler_rate=-0.55,
                  code_phase_chips=4321.25, cn0_dbhz=50.0)
    sats = [
        SatParams(prn=glonass_l3.pilot_prn(prn), nav_bits=pilot_ov,
                  carrier_phase=0.0, **common),
        SatParams(prn=glonass_l3.data_prn(prn), nav_bits=data_ov,
                  carrier_phase=np.pi / 2, **common),
    ]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=6)
    src = SimSource(sim, n_ms + 30)

    # 250 Hz bins: the flip-invariant (2-quadrant) FLL's pull-in is
    # +-1/(4*pdi) = +-250 Hz, so the handoff error must stay within
    # +-125 Hz.
    acq = AcqConfig(doppler_band=7e3, coherent_ms=1, threshold=2.5,
                    doppler_step=250.0, prn_list=(prn,))
    res = acquire(src.read(0, acq_samples_needed(SIG, acq)), SIG, acq)
    assert prn in res.detected_prns()
    spchip = SIG.fs / SIG.code_freq
    spc = SIG.samples_per_code
    expect = (common["code_phase_chips"] * spchip) % spc
    err = (res.code_phase[prn - 1] - expect + spc / 2) % spc - spc / 2
    assert abs(err) <= 2 * spchip

    ch = ChannelInit(prn=prn, code_phase=int(res.code_phase[prn - 1]),
                     doppler_hz=float(res.carr_freq[prn - 1]) - SIG.if_freq)
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.3, pll_bw=25.0, fll_bw=250.0,
                      aid_div=glonass_l3.CARRIER_HZ / glonass_l3.CODE_FREQ)
    tr = track_dual(src, [ch], SIG, trk, n_ms, chunk_ms=130)

    # Carrier lock: tracked Doppler follows the ramp 2800 - 0.55 t.
    t = np.arange(n_ms) * 1e-3
    true_dopp = 2800.0 - 0.55 * t
    err_hz = tr.carr_freq[0] - SIG.if_freq - true_dopp
    assert abs(np.mean(err_hz[300:])) < 3.0

    # Pilot prompt carries NH; data prompt rides in quadrature (q_p2).
    sync = l3nav.sync_overlay(tr.i_p[0, 200:])
    assert sync.found and sync.quality > 0.9
    # Codeword boundaries lie on the overlay epoch's 5 ms symbol grid;
    # brute-force the cycle phase (a live receiver would use the frame
    # preamble) and require an exact Viterbi recovery of the data bits.
    q = tr.q_p2[0] * sync.polarity
    base = 200 + sync.first_ms
    cw_ms = 5 * cycle_sym
    found = False
    for s0 in range(base, base + cw_ms, 5):
        seg = q[s0: s0 + cw_ms]
        sym_soft = seg.reshape(-1, 5) @ glonass_l3.BARKER5.astype(np.float64)
        dec = l3nav.viterbi_decode(sym_soft, polys=l3nav.L3_POLYS,
                                   invert=l3nav.L3_INVERT)
        if np.array_equal(dec.astype(np.int8), bits):
            found = True
            break
    assert found, "encoded data bits not recovered"


def test_fused_dual_kernel_matches_scan_dual():
    """Production fused dual-code kernel (HBM tap-row table + per-block
    row DMA) vs the exact gather-mode scan dual tracker: same loop
    trajectories (the fused path quantizes code phase to 1/64 chip, so
    accumulators agree to ~% and the filters to sub-Hz), and the closed
    loop converges on a simulated L3 stream."""
    import jax.numpy as jnp

    from gnsstpu.tracking.dual import (dual_fused_table,
                                       make_dual_tracker,
                                       make_fused_dual_tracker)
    from gnsstpu.tracking.scan import TrackState

    sig = SignalConfig(signal="glonass_l3oc", if_freq=0.0, fs=12.0e6,
                       code_freq=glonass_l3.CODE_FREQ,
                       code_length=glonass_l3.CODE_LENGTH,
                       complex_iq=True)
    n_ms = 140
    prn = 14
    rng = np.random.default_rng(3)
    pilot_ov, data_ov, _ = overlay_streams(
        rng.integers(0, 2, 4).astype(np.int8), n_ms + 10)
    common = dict(doppler_hz=1800.0, code_phase_chips=2345.5,
                  cn0_dbhz=50.0)
    sats = [SatParams(prn=glonass_l3.pilot_prn(prn), nav_bits=pilot_ov,
                      carrier_phase=0.0, **common),
            SatParams(prn=glonass_l3.data_prn(prn), nav_bits=data_ov,
                      carrier_phase=np.pi / 2, **common)]
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=8)
    chunk = jnp.asarray(sim.generate(n_ms + 3))

    spchip = sig.fs / sig.code_freq
    cp0 = int(round(common["code_phase_chips"] * spchip))
    state0 = TrackState.init(np.array([cp0]),
                             np.array([common["doppler_hz"] + 30.0],
                                      np.float32))
    import jax
    state0 = jax.tree.map(jnp.asarray, state0)
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.3, pll_bw=25.0,
                      fll_bw=250.0,
                      aid_div=glonass_l3.CARRIER_HZ / glonass_l3.CODE_FREQ)
    carr_base = jnp.asarray(np.array([0], np.uint32))

    def pad(c):
        return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)

    pilot = jnp.asarray(pad(glonass_l3.generate_l3_code(
        glonass_l3.pilot_prn(prn)))[None])
    data = jnp.asarray(pad(glonass_l3.generate_l3_code(
        glonass_l3.data_prn(prn)))[None])
    ref_tracker = make_dual_tracker(sig, trk, n_blocks=n_ms)
    rs, ro = ref_tracker(chunk, pilot, data, carr_base, state0)

    tab = jnp.asarray(dual_fused_table(sig, trk, [prn]))
    fused = make_fused_dual_tracker(sig, trk, n_blocks=n_ms,
                                    interpret=True)
    gs, go = fused(chunk, tab, carr_base, state0)

    # Loop trajectories track the exact engine.
    np.testing.assert_allclose(np.asarray(go.carr_doppler),
                               np.asarray(ro.carr_doppler), atol=1.5)
    # Both converge to the true Doppler.
    assert abs(float(np.asarray(go.carr_doppler)[-20:].mean())
               - common["doppler_hz"]) < 3.0
    # Accumulators: phase-quantized rows vs exact gathers, ~% level.
    a, b = np.asarray(go.acc.ip), np.asarray(ro.acc.ip)
    assert np.max(np.abs(a - b)) < 0.05 * np.abs(b).max()
    # Pilot prompt strong; data component rides in quadrature.
    # C/N0 50 dB-Hz at 12 Msps -> per-component amplitude ~0.13, full
    # coherent prompt ~1560; mid-settling correlation ~900 vs a noise
    # floor of ~110 (sigma * sqrt(spc)).
    spc_n = sig.samples_per_code
    assert np.abs(a[-10:]).mean() > 0.05 * spc_n
    q2 = np.asarray(go.acc.qp2)
    assert np.abs(q2[-10:]).mean() > 0.05 * spc_n
    # Sample positions advance identically (same block geometry).
    np.testing.assert_array_equal(np.asarray(gs.corr.sample_pos),
                                  np.asarray(rs.corr.sample_pos))
