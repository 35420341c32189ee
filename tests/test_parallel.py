"""Sharding tests on the virtual 8-device CPU mesh.

Checks (SURVEY.md §4 test plan item d): sharded multi-device execution is
bit-identical to single-device execution for both acquisition and
tracking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnsstpu.config import AcqConfig, SignalConfig, TrackConfig
from gnsstpu.ops import code_tables, fft_acquire
from gnsstpu.parallel import (make_mesh, shard_acquisition_inputs,
                              shard_channel_state)
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import scan as tscan

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def sim_samples():
    sats = [SatParams(prn=p, doppler_hz=500.0 * p, code_phase_chips=31.0 * p,
                      cn0_dbhz=46.0) for p in (3, 9, 17, 25)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=5)
    return sats, sim.generate(40)


def test_sharded_acquisition_matches_single_device(sim_samples):
    sats, samples = sim_samples
    acq = AcqConfig(doppler_band=7e3, coherent_ms=2, threshold=2.5,
                    doppler_step=500.0)
    spc = SIG.samples_per_code
    L = acq.coherent_ms * spc
    lw = fft_acquire.window_len(spc, acq.coherent_ms)
    blocks = jnp.asarray(np.stack([samples[:lw], samples[L:L + lw]]))
    fd_re, fd_im = fft_acquire.code_fd_table(
        SIG.signal, SIG.fs, SIG.code_freq, SIG.code_length, acq.coherent_ms)
    fd_re, fd_im = jnp.asarray(fd_re), jnp.asarray(fd_im)
    dopp = jnp.asarray(fft_acquire.doppler_grid(
        0.0, acq.doppler_band, 500.0), jnp.float32)
    # 15 bins -> pad to 16 for an even shard over 4 doppler devices.
    dopp = jnp.concatenate([dopp, dopp[-1:] + 500.0])

    ref_cube = fft_acquire.acquire_cube(blocks, fd_re, fd_im, dopp,
                                        SIG.fs, spc)
    ref = fft_acquire.peak_metrics(
        ref_cube, samples_per_code=spc,
        samples_per_chip=round(SIG.fs / SIG.code_freq))

    mesh = make_mesh([("channel", 2), ("doppler", 4)])
    b_s, cr_s, ci_s, d_s = shard_acquisition_inputs(
        blocks, fd_re, fd_im, dopp, mesh)
    cube = fft_acquire.acquire_cube(b_s, cr_s, ci_s, d_s, SIG.fs, spc)
    got = fft_acquire.peak_metrics(
        cube, samples_per_code=spc,
        samples_per_chip=round(SIG.fs / SIG.code_freq))

    assert np.array_equal(np.asarray(got["code_phase"]),
                          np.asarray(ref["code_phase"]))
    assert np.array_equal(np.asarray(got["doppler_bin"]),
                          np.asarray(ref["doppler_bin"]))
    np.testing.assert_allclose(np.asarray(got["metric"]),
                               np.asarray(ref["metric"]), rtol=1e-5)


def test_sharded_tracking_matches_single_device(sim_samples):
    sats, samples = sim_samples
    trk = TrackConfig(dll_bw=1.0)
    spchip = SIG.fs / SIG.code_freq
    # 8 channels (2 per simulated SV) so the channel axis shards evenly.
    prns = [s.prn for s in sats] * 2
    cps = [int(round(s.code_phase_chips * spchip)) for s in sats] * 2
    dops = [s.doppler_hz + 25.0 for s in sats] * 2

    padded = code_tables.padded_code_table(SIG.signal)
    codes = jnp.asarray(
        np.stack([padded[p - 1] for p in prns]).astype(np.float32))
    n_blocks = 8
    tracker = tscan.make_tracker(SIG, trk, n_blocks=n_blocks)
    chunk = jnp.asarray(samples[: (n_blocks + 2) * SIG.samples_per_code])

    cb, ia = tscan.channel_consts(SIG, trk, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    state0 = tscan.TrackState.init(np.array(cps), np.array(dops, np.float32))
    ref_state, ref_out = tracker(chunk, codes, consts, state0)

    mesh = make_mesh([("channel", 4), ("doppler", 2)])
    st_s, codes_s = shard_channel_state(state0, codes, mesh)
    consts_s = tuple(
        jax.device_put(c, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("channel"))) for c in consts)
    chunk_s = jax.device_put(
        chunk, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
    got_state, got_out = tracker(chunk_s, codes_s, consts_s, st_s)

    for a, b in zip(jax.tree.leaves(ref_out), jax.tree.leaves(got_out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(got_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timeblock_long_coherent_matches_oracle():
    """Time-block sharded long coherent acquisition (overlap-save halo via
    ppermute + psum coherent combine) must match the single-device oracle
    and find the right code phase with full coherent gain."""
    import jax.numpy as jnp

    from gnsstpu.parallel.mesh import make_mesh
    from gnsstpu.parallel.timeblock import (long_coherent_acquire,
                                            reference_coherent_power)

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    sat = SatParams(prn=3, doppler_hz=100.0, code_phase_chips=412.5,
                    cn0_dbhz=50.0)
    sim = IFSimulator(sig, [sat], noise_sigma=0.2, seed=23)
    k = 8
    samples = sim.generate(k + 2)
    prns = [3, 9]
    dopp = np.array([-150.0, 100.0, 350.0])

    mesh = make_mesh([("time", 4)])
    cube = np.asarray(long_coherent_acquire(
        samples, sig, prns, dopp, mesh, k_periods=k))
    want = reference_coherent_power(samples, sig, prns, dopp, k)

    # f32 sharded vs f64 oracle.
    scale = want.max()
    assert np.allclose(cube / scale, want / scale, atol=2e-3)
    # Peak at the true (prn, doppler, code phase).
    p, d, c = np.unravel_index(np.argmax(cube), cube.shape)
    assert (p, d) == (0, 1)
    spc = sig.samples_per_code
    expect = (sat.code_phase_chips * sig.fs / sig.code_freq) % spc
    err = (c - expect + spc / 2) % spc - spc / 2
    assert abs(err) <= 2.0
    # Degenerate 1-block mesh also works (tail-only halo path).
    mesh1 = make_mesh([("time", 1)])
    cube1 = np.asarray(long_coherent_acquire(
        samples, sig, prns, dopp, mesh1, k_periods=k))
    assert np.allclose(cube1 / scale, want / scale, atol=2e-3)


def test_sharded_fused_tracking_matches_single_device(sim_samples):
    """The PRODUCTION fused Pallas kernel under shard_map over the channel
    axis must be bit-identical to the single-device fused kernel (same
    pallas_call per shard; channels independent, zero collectives)."""
    from gnsstpu.parallel.fused_shard import (make_sharded_fused_tracker,
                                              shard_fused_inputs)
    from gnsstpu.tracking.fused import fused_code_table, make_fused_tracker

    sats, samples = sim_samples
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.3)
    spchip = SIG.fs / SIG.code_freq
    prns = [s.prn for s in sats] * 2           # 8 channels, 4-way shard
    cps = [int(round(s.code_phase_chips * spchip)) for s in sats] * 2
    dops = [s.doppler_hz + 25.0 for s in sats] * 2

    tab = jnp.asarray(fused_code_table(SIG, trk, prns))
    n_blocks = 6
    chunk = jnp.asarray(samples[: (n_blocks + 2) * SIG.samples_per_code])
    cb, ia = tscan.channel_consts(SIG, trk, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    state0 = tscan.TrackState.init(np.array(cps), np.array(dops, np.float32))
    state0 = jax.tree.map(jnp.asarray, state0)

    single = make_fused_tracker(SIG, trk, n_blocks=n_blocks, interpret=True)
    ref_state, ref_out = single(chunk, tab, consts, state0)

    mesh = make_mesh([("channel", 4)])
    st_s, tab_s, consts_s, chunk_s = shard_fused_inputs(
        state0, tab, consts, chunk, mesh)
    sharded = make_sharded_fused_tracker(
        SIG, trk, mesh=mesh, n_blocks=n_blocks, interpret=True)
    got_state, got_out = sharded(chunk_s, tab_s, consts_s, st_s)

    for a, b in zip(jax.tree.leaves(ref_out), jax.tree.leaves(got_out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(got_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timeblock_mm_fft_mode_matches_oracle():
    """The MXU matmul-DFT mode must run under shard_map (psum/ppermute
    around batched dots) and stay within f32 matmul error of the oracle."""
    from gnsstpu.parallel.mesh import make_mesh
    from gnsstpu.parallel.timeblock import (long_coherent_acquire,
                                            reference_coherent_power)

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    sat = SatParams(prn=3, doppler_hz=100.0, code_phase_chips=412.5,
                    cn0_dbhz=50.0)
    sim = IFSimulator(sig, [sat], noise_sigma=0.2, seed=23)
    k = 8
    samples = sim.generate(k + 2)
    want = reference_coherent_power(samples, sig, [3, 9],
                                    np.array([-150.0, 100.0, 350.0]), k)
    mesh = make_mesh([("time", 4)])
    cube = np.asarray(long_coherent_acquire(
        samples, sig, [3, 9], np.array([-150.0, 100.0, 350.0]), mesh,
        k_periods=k, fft_mode="mm"))
    scale = want.max()
    assert np.allclose(cube / scale, want / scale, atol=2e-3)


def _mgr_parity_run(mesh, engine, n_ms=600):
    """One ChannelManager run (pipelined superepochs, on-chunk reacq
    armed) over a deterministic 3-SV signal; mesh=None is the
    single-device control."""
    import io

    from gnsstpu.config import ReceiverConfig
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.sources import ArraySource
    from gnsstpu.runtime.telemetry import Telemetry

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    sats = [SatParams(prn=p, doppler_hz=300.0 * (p - 5),
                      code_phase_chips=211.5 * p, cn0_dbhz=47.0)
            for p in (2, 5, 9)]
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=13)
    samples = np.asarray(sim.generate(n_ms + 60))
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=(2, 5, 9), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3),
        n_channels=4)
    mgr = ChannelManager(
        ArraySource(samples), cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, reacq_period_ms=400, cn0_drop_dbhz=35.0,
        prn_pool=[2, 5, 9, 17], sync_every=2, prefetch=True,
        engine=engine, mesh=mesh)
    recs = mgr.run(n_ms)
    return mgr, recs


@pytest.mark.parametrize("engine", ["gather", "fused"])
def test_manager_mesh_matches_unsharded(engine):
    """ChannelManager(mesh=...) is a FIRST-CLASS capability: the public
    constructor shards the slot bank + tracking state over the channel
    axis (fused engine via shard_map per device, scan engines via
    GSPMD) and the full pipelined receiver run — acquisition handoff,
    superepoch scans, on-chunk reacquisition, supervision — produces
    BIT-EXACT records and prompt streams vs the unsharded manager
    (SURVEY §4(d): sharded-vs-unsharded parity is the framework's own
    test obligation)."""
    n_ms = 400 if engine == "fused" else 600
    mesh = make_mesh([("channel", 2)])
    m1, r1 = _mgr_parity_run(None, engine, n_ms)
    m2, r2 = _mgr_parity_run(mesh, engine, n_ms)

    assert len(r1) == len(r2) > 0
    for a, b in zip(r1, r2):
        assert np.array_equal(a.prn, b.prn)
        assert np.array_equal(a.cn0_dbhz, b.cn0_dbhz)
        assert np.array_equal(a.pll_lock, b.pll_lock)
        assert np.array_equal(a.doppler_hz, b.doppler_hz)
    live = [int(p) for p in r1[-1].prn if p]
    assert len(live) >= 2 and set(live) <= {2, 5, 9}
    for prn in live:
        s1 = m1.prompt_stream(prn)
        s2 = m2.prompt_stream(prn)
        for key in ("i_p", "q_p", "carr_doppler", "abs_sample",
                    "carr_cycles"):
            assert np.array_equal(s1[key], s2[key]), (prn, key)
    # The sharded run really placed state on the mesh.
    sp = m2._state.corr.sample_pos
    assert getattr(sp.sharding, "mesh", None) is not None
