"""Pipelined ChannelManager (superepochs + packed wire) tests.

The sync_every > 1 path batches K supervision epochs into one device
round-trip with device-side lock assessment (manager._run_superepoch).
The tracking trajectory must be IDENTICAL to the serial lockstep loop —
the chained device calls see exactly the same state the rebased
per-epoch calls do — and the packed 2-bit wire must still acquire,
confirm and hold lock (quantization costs SNR, not correctness).
"""

import io
import json

import numpy as np

from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                            TrackConfig)
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.sources import ArraySource, PackedArraySource
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)

SATS = [
    SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
              cn0_dbhz=47.0),
    SatParams(prn=12, doppler_hz=-1500.0, code_phase_chips=700.25,
              cn0_dbhz=46.0),
]


def _cfg(n_channels=3):
    return ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=n_channels,
    )


def _run(source, sync_every, n_ms=800, **kw):
    mgr = ChannelManager(
        source, _cfg(), telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, reacq_period_ms=400, cn0_drop_dbhz=35.0,
        prn_pool=[5, 12], sync_every=sync_every, **kw)
    recs = mgr.run(n_ms)
    return mgr, recs


def test_pipelined_matches_serial():
    """sync_every=4 must reproduce the serial loop's prompt/Doppler
    trajectories bit-exactly on a healthy signal (no slot churn)."""
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    m1, r1 = _run(ArraySource(samples.copy()), sync_every=1)
    m4, r4 = _run(ArraySource(samples.copy()), sync_every=4)

    assert len(r1) == len(r4)
    for prn in (5, 12):
        h1 = m1.prompt_stream(prn)
        h4 = m4.prompt_stream(prn)
        np.testing.assert_array_equal(h1["i_p"], h4["i_p"])
        np.testing.assert_array_equal(h1["q_p"], h4["q_p"])
        np.testing.assert_array_equal(h1["carr_doppler"],
                                      h4["carr_doppler"])
        np.testing.assert_allclose(h1["abs_sample"], h4["abs_sample"],
                                   rtol=0, atol=1e-6)
    # Lock stats: device f32 assess vs host f64 assess — equal to f32.
    for a, b in zip(r1, r4):
        np.testing.assert_allclose(a.cn0_dbhz, b.cn0_dbhz, atol=1e-2)
        np.testing.assert_allclose(a.pll_lock, b.pll_lock, atol=1e-4)
    states = {s.prn: s.state for s in m4.slots}
    assert states.get(5) is SlotState.TRACKING
    assert states.get(12) is SlotState.TRACKING


def test_pipelined_packed_wire_tracks():
    """2-bit sign/mag wire (GN3S format, 4x less host->device traffic):
    the manager ships packed bytes, unpacks on device, and still
    acquires + confirms + tracks the right Doppler."""
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    src = PackedArraySource(samples, fmt="sm2", scale=1.0)
    mgr, recs = _run(src, sync_every=4)
    assert mgr.wire == "sm2"
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i5 = list(last.prn).index(5)
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i5] - 900.0) < 5.0
    assert abs(last.doppler_hz[i12] + 1500.0) < 5.0
    assert last.cn0_dbhz[i5] > 40.0


def test_prefetch_matches_serial():
    """prefetch=True (free-running device pipeline, reader-thread
    chunk prefetch, lagged supervision) must reproduce the serial
    loop's trajectories bit-exactly when no slot churn intervenes."""
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    m1, r1 = _run(ArraySource(samples.copy()), sync_every=4)
    mp, rp = _run(ArraySource(samples.copy()), sync_every=4,
                  prefetch=True)

    assert len(r1) == len(rp)
    for prn in (5, 12):
        h1 = m1.prompt_stream(prn)
        hp = mp.prompt_stream(prn)
        np.testing.assert_array_equal(h1["i_p"], hp["i_p"])
        np.testing.assert_array_equal(h1["q_p"], hp["q_p"])
        np.testing.assert_array_equal(h1["carr_doppler"],
                                      hp["carr_doppler"])
        np.testing.assert_allclose(h1["abs_sample"], hp["abs_sample"],
                                   rtol=0, atol=1e-6)
    for a, b in zip(r1, rp):
        np.testing.assert_allclose(a.cn0_dbhz, b.cn0_dbhz, atol=1e-6)
    states = {s.prn: s.state for s in mp.slots}
    assert states.get(5) is SlotState.TRACKING
    assert states.get(12) is SlotState.TRACKING


def test_prefetch_packed_wire_tracks():
    """Prefetch pipeline over the packed 2-bit wire: acquire, confirm,
    track, correct Doppler — the production live configuration."""
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    src = PackedArraySource(samples, fmt="sm2", scale=1.0)
    mgr, recs = _run(src, sync_every=4, prefetch=True)
    assert mgr.wire == "sm2"
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i5 = list(last.prn).index(5)
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i5] - 900.0) < 5.0
    assert abs(last.doppler_hz[i12] + 1500.0) < 5.0
    assert last.cn0_dbhz[i5] > 40.0


def test_prefetch_chunk_reacquisition():
    """A PRN appearing mid-run is picked up by the on-chunk search in
    prefetch mode; the handoff lands one superepoch later than serial
    (lagged supervision) and must still confirm and track."""
    src = LateSvSource(SIG, SATS, 1700, switch_ms=400)
    sink = io.StringIO()
    mgr = ChannelManager(
        src, _cfg(), telemetry=Telemetry(sink=sink), epoch_ms=100,
        reacq_period_ms=300, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=4, prefetch=True)
    recs = mgr.run(1600)
    evs = [json.loads(e) for e in sink.getvalue().splitlines()
           if '"event"' in e]
    starts = [e for e in evs if e["what"] == "channel_start"]
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i12] + 1500.0) < 5.0


class LateSvSource:
    """Second satellite appears only after switch_ms: exercises the
    on-chunk reacquisition path while the first SV is already tracking."""

    def __init__(self, sig, sats, n_ms, switch_ms, seed=3):
        self.block = int(round(sig.fs * 1e-3))
        self.n_ms = n_ms
        self.switch = switch_ms * self.block
        self.early = IFSimulator(sig, sats[:1], noise_sigma=1.0, seed=seed)
        self.late = IFSimulator(sig, sats, noise_sigma=1.0, seed=seed)

    def _gen(self, sim, start, count):
        ms0 = start // self.block
        ms1 = min((start + count - 1) // self.block + 1, self.n_ms)
        if ms1 <= ms0:
            return np.zeros((count, 2), np.float32)
        buf = sim.generate(ms1 - ms0, ms0)
        out = np.zeros((count, 2), np.float32)
        off = start - ms0 * self.block
        avail = buf[off: off + count]
        out[: len(avail)] = avail
        return out

    def read(self, start, count):
        if start >= self.switch:
            return self._gen(self.late, start, count)
        if start + count <= self.switch:
            return self._gen(self.early, start, count)
        n1 = self.switch - start
        return np.concatenate(
            [self._gen(self.early, start, n1),
             self._gen(self.late, self.switch, count - n1)])

    def __len__(self):
        return self.n_ms * self.block


def test_pipelined_chunk_reacquisition():
    """A PRN that appears mid-run is picked up by the acquisition search
    riding the superepoch's device chunk (no separate sample upload)."""
    src = LateSvSource(SIG, SATS, 1300, switch_ms=400)
    sink = io.StringIO()
    mgr = ChannelManager(
        src, _cfg(), telemetry=Telemetry(sink=sink), epoch_ms=100,
        reacq_period_ms=300, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=4)
    recs = mgr.run(1200)
    evs = [json.loads(e) for e in sink.getvalue().splitlines()
           if '"event"' in e]
    starts = [e for e in evs if e["what"] == "channel_start"]
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i12] + 1500.0) < 5.0


def test_weak_reacq_accumulates_across_superepochs():
    """A weak-tier (10 ms x 15 noncoherent, the reference's 310 ms
    buffered search, acquisition.cpp:433) whose window exceeds one
    superepoch chunk accumulates its noncoherent sum cube ON DEVICE
    across consecutive uploaded chunks (VERDICT r4 item 3): after the
    cold start, the late SV is found with ZERO host-path searches —
    no extra source reads or uploads, ever."""
    from gnsstpu.acquisition.search import acq_samples_needed

    src = LateSvSource(SIG, SATS, 1600, switch_ms=400)
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=10, noncoherent=15,
                      threshold=1.8, prn_list=(5, 12),
                      fine_doppler_ms=10, doppler_step=100.0),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sink = io.StringIO()
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=sink), epoch_ms=100,
        reacq_period_ms=600, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=1)
    assert mgr._chunk_len < acq_samples_needed(SIG, cfg.acq)
    recs = mgr.run(1400)
    lines = [json.loads(l) for l in sink.getvalue().splitlines()]
    starts = [e for e in lines if e.get("what") == "channel_start"]
    # PRN 5 acquired cold at 0 (host path: nothing was tracking, so
    # there is no chunk to ride); PRN 12 appears at 400 ms and is
    # picked up by the CROSS-SUPEREPOCH device accumulation while 5
    # tracks — the only host-path search of the whole run is epoch 0.
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    host_acq = [e for e in lines if e.get("stage") == "acquire"]
    assert len(host_acq) == 1 and host_acq[0]["epoch_ms"] == 0
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i12] + 1500.0) < 8.0


def test_weak_fdma_reacq_accumulates_pipelined():
    """FDMA mirror of the weak-tier accumulation, on the PREFETCH
    pipeline: a GLONASS noncoherent search wider than the superepoch
    chunk completes from chunk-riding partial sums with zero host-path
    searches after cold start."""
    from gnsstpu.acquisition.search import acq_samples_needed

    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=4.096e6,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    step = 562.5e3
    sats = [
        SatParams(prn=5, doppler_hz=1100.0, if_offset_hz=-3 * step,
                  code_phase_chips=120.5, cn0_dbhz=47.0),
        SatParams(prn=12, doppler_hz=-1700.0, if_offset_hz=4 * step,
                  code_phase_chips=333.25, cn0_dbhz=46.0),
    ]
    src = LateSvSource(sig, sats, 1700, switch_ms=400)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=5e3, coherent_ms=4, noncoherent=15,
                      threshold=1.8, prn_list=(5, 12),
                      fine_doppler_ms=10, doppler_step=125.0),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sink = io.StringIO()
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=sink), epoch_ms=20,
        reacq_period_ms=300, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=2, prefetch=True)
    assert mgr._chunk_len < acq_samples_needed(sig, cfg.acq)
    recs = mgr.run(1600)
    lines = [json.loads(l) for l in sink.getvalue().splitlines()]
    starts = [e for e in lines if e.get("what") == "channel_start"]
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    host_acq = [e for e in lines if e.get("stage") == "acquire"]
    assert len(host_acq) == 1 and host_acq[0]["epoch_ms"] == 0
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}


def test_reacq_host_fallback_unsupported_tier():
    """The host-path fallback safety net still exists for a search the
    chunk can never serve: a MAX-combined (bit-dodge) window set wider
    than the chunk cannot accumulate across chunks (max is not
    stream-splittable the way the noncoherent sum is), so the manager
    pays the host read rather than silently never searching again."""
    from gnsstpu.acquisition.search import acq_samples_needed

    src = LateSvSource(SIG, SATS, 1600, switch_ms=400)
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=30, n_windows=2,
                      threshold=1.6, prn_list=(5, 12),
                      fine_doppler_ms=10, doppler_step=30.0),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sink = io.StringIO()
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=sink), epoch_ms=25,
        reacq_period_ms=500, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=1)
    assert mgr._chunk_len < acq_samples_needed(SIG, cfg.acq)
    recs = mgr.run(1400)
    lines = [json.loads(l) for l in sink.getvalue().splitlines()]
    starts = [e for e in lines if e.get("what") == "channel_start"]
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    # The late SV was found by the HOST fallback (an 'acquire' timer
    # after epoch 0 proves the fallback fired).
    host_acq = [e for e in lines if e.get("stage") == "acquire"]
    assert any(e["epoch_ms"] > 0 for e in host_acq)
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}


def test_fdma_chunk_reacquisition():
    """GLONASS FDMA reacquisition rides the uploaded superepoch chunk:
    after the cold start, a frequency channel appearing mid-run is
    found with ZERO host-path searches (no extra source reads/uploads
    per scheduled search — VERDICT r3 weak #2)."""
    sig = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=4.096e6,
                       code_freq=0.511e6, code_length=511,
                       fdma_step=562.5e3, complex_iq=True)
    step = 562.5e3
    sats = [
        SatParams(prn=5, doppler_hz=1100.0, if_offset_hz=-3 * step,
                  code_phase_chips=120.5, cn0_dbhz=47.0),
        SatParams(prn=12, doppler_hz=-1700.0, if_offset_hz=4 * step,
                  code_phase_chips=333.25, cn0_dbhz=46.0),
    ]
    src = LateSvSource(sig, sats, 1700, switch_ms=400)
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.2,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sink = io.StringIO()
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=sink), epoch_ms=100,
        reacq_period_ms=300, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=4)
    recs = mgr.run(1600)
    lines = [json.loads(l) for l in sink.getvalue().splitlines()]
    starts = [e for e in lines
              if e.get("what") == "channel_start"]
    assert any(s["prn"] == 5 and s["epoch_ms"] == 0 for s in starts)
    late = [s for s in starts if s["prn"] == 12]
    assert late and late[0]["epoch_ms"] >= 400
    # The ONLY host-path search is the cold start; every later search
    # rode the chunk (host-path searches emit an 'acquire' task timer).
    host_acq = [e for e in lines if e.get("stage") == "acquire"]
    assert len(host_acq) == 1 and host_acq[0]["epoch_ms"] == 0
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i12] + 1700.0) < 8.0


def test_device_resident_source_tracks():
    """DevicePackedArraySource (packed signal resident in device
    memory, zero per-chunk upload): the prefetch manager acquires,
    confirms and tracks from it — including the end-of-data stop."""
    from gnsstpu.runtime.sources import DevicePackedArraySource

    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    src = DevicePackedArraySource(samples, fmt="sm2", scale=1.0)
    mgr, recs = _run(src, sync_every=4, prefetch=True)
    assert mgr.wire == "sm2"
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i5 = list(last.prn).index(5)
    assert abs(last.doppler_hz[i5] - 900.0) < 5.0
    assert last.cn0_dbhz[i5] > 40.0


def test_weak_accumulation_refuses_sub_window_advance():
    """When the superepoch ADVANCE is shorter than one coherent window
    (adv < (coh+1)*spc), every chunk's window would reach into the next
    chunk's samples and enter the noncoherent sum twice — inflating the
    accumulated metric vs the false-alarm calibration. The accumulator
    must refuse such configs (host full-buffer search takes over)
    rather than double-count."""
    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=3)
    buf = np.asarray(sim.generate(120))
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=10, noncoherent=15,
                      threshold=1.8, prn_list=(5, 12),
                      fine_doppler_ms=10, doppler_step=100.0),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    mgr = ChannelManager(
        ArraySource(buf), cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=10, sync_every=1)
    spc = SIG.samples_per_code
    adv = mgr._espc * mgr.sync_every
    assert adv < (cfg.acq.coherent_ms + 1) * spc   # the regime under test
    assert mgr._make_acq_wk() is None
    assert mgr._wk_step(None, 0, 10 ** 9)[0] == "unsupported"


def test_clock_commits_per_superepoch_on_error():
    """Epochs already supervised stay CONSUMED when a later superepoch
    raises (device error, unrecoverable stall): clock_ms reflects the
    committed work, and a retry run() continues with fresh labels —
    never re-issuing already-emitted epoch_ms on new data."""
    import pytest

    sim = IFSimulator(SIG, SATS, noise_sigma=1.0, seed=4)
    buf = np.asarray(sim.generate(1100))
    mgr = ChannelManager(
        ArraySource(buf), _cfg(), telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, sync_every=2)
    real = mgr._run_superepoch
    done = []

    def boom(e0, k):
        if len(done) == 2:
            raise RuntimeError("injected device failure")
        done.append(e0)
        return real(e0, k)

    mgr._run_superepoch = boom
    with pytest.raises(RuntimeError, match="injected"):
        mgr.run(800)
    assert mgr.clock_ms == 400       # two 2-epoch superepochs committed
    mgr._run_superepoch = real
    recs = mgr.run(200)              # retry: picks up AFTER the commit
    labels = [r.epoch_ms for r in recs]
    assert len(labels) == len(set(labels))
    assert max(labels) == 500
