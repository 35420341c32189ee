"""Runtime layer tests: lock detection, channel manager life-cycle,
checkpoint/resume, telemetry.

Covers the reference's SV_Select/Channel supervision semantics
(sv_select.cpp free-channel acquisition scheduling; Channel::Error/Kill
teardown on loss of lock + re-queue) and the Scilab skipAcquisition /
trackingResults.dat resume path (SURVEY.md §5 checkpoint/resume).
"""

import io

import numpy as np

from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                            TrackConfig)
from gnsstpu.runtime import checkpoint
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.tracking import lock as tlock

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)


def test_lock_detector_separates_signal_from_noise():
    rng = np.random.default_rng(2)
    n = 200
    a = 500.0
    bits = np.repeat(rng.choice([-1.0, 1.0], n // 20), 20)
    i_sig = a * bits + rng.normal(0, 30.0, n)
    q_sig = rng.normal(0, 30.0, n)
    i_noise = rng.normal(0, 120.0, n)
    q_noise = rng.normal(0, 120.0, n)
    st = tlock.assess(
        np.stack([0.7 * i_sig, i_noise]), np.stack([0.7 * q_sig, q_noise]),
        np.stack([i_sig, i_noise]), np.stack([q_sig, q_noise]),
        np.stack([0.7 * i_sig, i_noise]), np.stack([0.7 * q_sig, q_noise]),
        t_int_s=1e-3)
    assert bool(st.locked[0]) and not bool(st.locked[1])
    # NWPR C/N0 of the constructed signal: a^2/(2*sigma^2)/T ~ 51.4 dB-Hz.
    truth = 10 * np.log10(a ** 2 / (30.0 ** 2) / 1e-3)
    assert abs(st.cn0_dbhz[0] - truth) < 4.0
    assert st.pll_lock[0] > 0.9 and st.pll_lock[1] < 0.5


class DyingSvSource:
    """SV set changes at a switch point: the first satellite of `sats`
    disappears after switch_ms (signal keeps running for the rest)."""

    def __init__(self, sig, sats, n_ms, switch_ms, seed=3):
        self.block = int(round(sig.fs * 1e-3))
        self.n_ms = n_ms
        self.switch = switch_ms * self.block
        self.a = IFSimulator(sig, sats, noise_sigma=1.0, seed=seed)
        self.b = IFSimulator(sig, sats[1:], noise_sigma=1.0, seed=seed)

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
            return self._gen(self.b, start, count)
        if start + count <= self.switch:
            return self._gen(self.a, start, count)
        n1 = self.switch - start
        return np.concatenate([self._gen(self.a, start, n1),
                               self._gen(self.b, self.switch, count - n1)])

    def __len__(self):
        return self.n_ms * self.block


def test_manager_acquires_tracks_drops_requeues():
    sats = [
        SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                  cn0_dbhz=47.0),
        SatParams(prn=12, doppler_hz=-1500.0, code_phase_chips=700.25,
                  cn0_dbhz=46.0),
    ]
    n_ms = 1100
    src = DyingSvSource(SIG, sats, n_ms + 50, switch_ms=500)
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3,
    )
    sink = io.StringIO()
    tlm = Telemetry(sink=sink)
    mgr = ChannelManager(src, cfg, telemetry=tlm, epoch_ms=100,
                         drop_after_epochs=2, reacq_period_ms=300,
                         cn0_drop_dbhz=35.0, prn_pool=[5, 12])
    recs = mgr.run(n_ms)
    assert len(recs) > 0

    events = [e for e in sink.getvalue().splitlines() if "event" in e]
    import json

    evs = [json.loads(e) for e in events]
    starts = [e for e in evs if e["what"] == "channel_start"]
    drops = [e for e in evs if e["what"] == "channel_drop"]
    # Both SVs acquired at the start.
    assert sorted({e["prn"] for e in starts if e["epoch_ms"] == 0}) \
        == [5, 12]
    # The dying SV was dropped after the switch.
    assert any(d["prn"] == 5 and d["epoch_ms"] >= 500 for d in drops)
    # The survivor tracked to the end with the right Doppler.
    last = recs[-1]
    live = {int(p) for p in last.prn if p != 0}
    assert 12 in live
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i12] - (-1500.0)) < 3.0
    assert last.cn0_dbhz[i12] > 40.0
    # PRN 5 was re-queued: at least one re-acquisition attempt happened
    # after the drop (it fails, the SV is gone — slot stays idle).
    drop_ms = min(d["epoch_ms"] for d in drops if d["prn"] == 5)
    assert not any(s["prn"] == 5 and s["epoch_ms"] > drop_ms + 200
                   for s in starts)
    slot_states = {s.prn: s.state for s in mgr.slots}
    assert slot_states.get(12) is SlotState.TRACKING


def test_checkpoint_resume_bitexact(tmp_path):
    """Resuming a scan from a restored checkpoint reproduces the exact
    prompt stream of an uninterrupted run."""
    import jax
    import jax.numpy as jnp

    from gnsstpu.ops import code_tables
    from gnsstpu.tracking import scan as tscan

    sat = SatParams(prn=7, doppler_hz=750.0, code_phase_chips=320.75,
                    cn0_dbhz=47.0)
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=8)
    chunk = jnp.asarray(sim.generate(220))
    padded = code_tables.padded_code_table(SIG.signal)
    codes = jnp.asarray(padded[6:7].astype(np.float32))
    trk = TrackConfig(dll_bw=1.0)
    spchip = SIG.fs / SIG.code_freq
    state = tscan.TrackState.init(
        np.array([int(round(sat.code_phase_chips * spchip))]),
        np.array([sat.doppler_hz + 25.0], np.float32))
    cb, ia = tscan.channel_consts(SIG, trk, [7])
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    tracker = tscan.make_tracker(SIG, trk, n_blocks=100)

    state1, out1 = tracker(chunk, codes, consts, state)

    path = str(tmp_path / "ckpt.npz")
    from gnsstpu.nav.types import Ephemeris

    eph = Ephemeris(week=202, sqrtA=5153.712, e=0.0123, M_0=-0.5,
                    t_oe=21600.0, valid=True)
    checkpoint.save(path, state=jax.tree.map(np.asarray, state1),
                    meta={"prn": 7, "ms_done": 100}, ephs={7: eph},
                    acq_metric=np.array([4.5]))

    state_r, meta, ephs, extra = checkpoint.load(path)
    assert meta["ms_done"] == 100
    assert ephs[7].sqrtA == eph.sqrtA and ephs[7].valid
    assert extra["acq_metric"][0] == 4.5

    # Continue both (original in-memory state vs restored) — bit-exact.
    _, out2a = tracker(chunk, codes, consts, state1)
    state_r = jax.tree.map(jnp.asarray, state_r)
    _, out2b = tracker(chunk, codes, consts, state_r)
    for f in ("ip", "qp", "ie", "carr_doppler", "rem_code_phase"):
        a = np.asarray(getattr(out2a, f))
        b = np.asarray(getattr(out2b, f))
        assert np.array_equal(a, b), f


def test_cli_simulate_acquire_roundtrip(tmp_path):
    """CLI surface: simulate writes an i8_iq IF file, acquire finds the
    simulated PRN at the right code phase."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "sim.if")
    env_args = [sys.executable, "-m", "gnsstpu"]
    r = subprocess.run(
        env_args + ["simulate", out, "--fs", "2.048e6", "--if-freq", "0",
                    "--sat", "4:1200:300.5:47", "--ms", "40"],
        capture_output=True, text=True, cwd="/root/repo", timeout=570)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        env_args + ["acquire", out, "--fs", "2.048e6", "--if-freq", "0",
                    "--band", "6e3", "--coherent", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=570)
    assert r.returncode == 0, r.stderr
    rows = [json.loads(x) for x in r.stdout.splitlines() if x.strip()]
    det = [x for x in rows if x["detected"]]
    assert [x["prn"] for x in det] == [4]
    assert abs(det[0]["carr_freq_hz"] - 1200.0) < 10.0


def test_manager_fused_engine_tracks(tmp_path):
    """The fused Pallas engine (the PRODUCTION path, engine='fused',
    interpret-mode off-TPU) drives the manager slot bank: acquisition
    hands off, the slot confirms and tracks with the right Doppler, and
    task_health stage timers are emitted (SURVEY §5 tracing)."""
    import json

    sats = [SatParams(prn=7, doppler_hz=1200.0, code_phase_chips=150.25,
                      cn0_dbhz=47.0)]
    n_ms = 400
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=11)

    class SimSource:
        def read(self, start, count):
            block = SIG.samples_per_code
            ms0 = max(0, start // block)
            buf = sim.generate(count // block + 3, ms0)
            off = start - ms0 * block
            return buf[off: off + count]

    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=(7,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3),
        n_channels=2,
    )
    sink = io.StringIO()
    mgr = ChannelManager(SimSource(), cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, engine="fused")
    assert mgr.engine == "fused"
    recs = mgr.run(n_ms)
    last = recs[-1]
    assert 7 in {int(p) for p in last.prn if p}
    i7 = list(last.prn).index(7)
    assert abs(last.doppler_hz[i7] - 1200.0) < 3.0
    assert last.cn0_dbhz[i7] > 40.0
    health = [json.loads(l) for l in sink.getvalue().splitlines()
              if '"task_health"' in l]
    stages = {h["stage"] for h in health}
    assert {"acquire", "track", "assess"} <= stages
    assert all(h["wall_s"] >= 0 for h in health)


def test_manager_warm_restart_no_reacquisition(tmp_path):
    """Manager-level warm restart (reference skipAcquisition role at
    the live-runtime level): a fresh manager restored from a saved
    channel bank resumes TRACKING at the saved stream positions with
    ZERO acquisition searches, and its Doppler matches truth."""
    import io as _io
    import json as _json

    from gnsstpu.runtime.manager import ChannelManager, SlotState
    from gnsstpu.runtime.sources import SimSource
    from gnsstpu.runtime.telemetry import Telemetry

    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0),
            SatParams(prn=12, doppler_hz=-1500.0,
                      code_phase_chips=700.25, cn0_dbhz=46.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=3)
    n_ms = 1500
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=3)

    def mk(sink):
        return ChannelManager(
            SimSource(IFSimulator(SIG, sats, noise_sigma=1.0, seed=3),
                      n_ms + 60), cfg,
            telemetry=Telemetry(sink=sink), epoch_ms=100,
            reacq_period_ms=400, cn0_drop_dbhz=35.0,
            prn_pool=[5, 12], sync_every=2)

    m1 = mk(_io.StringIO())
    m1.run(800)
    assert {s.prn for s in m1.slots if s.prn} == {5, 12}
    path = tmp_path / "bank.npz"
    m1.save_checkpoint(str(path))

    sink2 = _io.StringIO()
    m2 = mk(sink2)
    meta = m2.restore_checkpoint(str(path))
    assert meta["cursor"] == m1._cursor
    m2.run(600)
    evs = [_json.loads(l) for l in sink2.getvalue().splitlines()]
    # NO acquisition searches, no channel starts: the bank resumed.
    assert not [e for e in evs if e.get("what") == "channel_start"]
    assert not [e for e in evs if e.get("stage") == "acquire"]
    last_prn = {s.prn: i for i, s in enumerate(m2.slots) if s.prn}
    assert set(last_prn) == {5, 12}
    ch = [e for e in evs if e.get("type") == "channel_health"]
    d5 = [e["doppler_hz"] for e in ch if e.get("prn") == 5][-1]
    d12 = [e["doppler_hz"] for e in ch if e.get("prn") == 12][-1]
    assert abs(d5 - 900.0) < 5.0 and abs(d12 + 1500.0) < 5.0
    for s in m2.slots:
        if s.prn:
            assert s.state is SlotState.TRACKING

    # Carrier-phase continuity: the restored accumulator carries
    # acc/last_delta across the restart, so the resumed run's uint32
    # NCO mirror is BIT-EXACT vs one uninterrupted 1400 ms run
    # (reference: Measurement_M cycle counts survive for differencing,
    # objects/correlator.cpp:263-357).
    m0 = mk(_io.StringIO())
    m0.run(1400)
    for prn in (5, 12):
        a0 = m0.history[prn]["_cph"]
        a2 = m2.history[prn]["_cph"]
        assert a2.acc == a0.acc
        assert a2.phase_u32 == a0.phase_u32
        assert a2.last_delta == a0.last_delta
        # Absolute block indexing continues: evicted + appended blocks
        # equals the uninterrupted run's block count.
        n0 = sum(len(x) for x in m0.history[prn]["i_p"])
        n2 = (m2.history[prn]["evicted"]
              + sum(len(x) for x in m2.history[prn]["i_p"]))
        assert n2 == n0


def test_unbounded_source_bounds_history_by_default():
    """An unbounded live source (len >= 2^61) gets a 36 s default
    history window — constant memory by construction, like the
    reference's fixed 4000-deep FIFO (objects/fifo.cpp:53) — while a
    finite source keeps unbounded (offline-analysis) retention, and an
    explicit window always wins."""
    from gnsstpu.runtime.sources import ArraySource

    class UnboundedSource(ArraySource):
        def __len__(self):
            return 2 ** 62

    sim = IFSimulator(SIG, [SatParams(prn=5, doppler_hz=900.0,
                                      code_phase_chips=200.5,
                                      cn0_dbhz=47.0)],
                      noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(40))
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5,)),
        track=TrackConfig(dll_bw=1.0), n_channels=2)

    def mk(src, **kw):
        return ChannelManager(src, cfg,
                              telemetry=Telemetry(sink=io.StringIO()),
                              epoch_ms=10, prn_pool=[5], **kw)

    assert mk(UnboundedSource(samples)).history_window_ms == 36_000
    assert mk(ArraySource(samples)).history_window_ms is None
    assert mk(UnboundedSource(samples),
              history_window_ms=5_000).history_window_ms == 5_000


def test_bounded_history_plateaus_flat():
    """Long-run memory bound: with a history window, per-PRN prompt
    history and the records list PLATEAU — sampled at every supervision
    epoch over >= 3 windows, the retained sizes never exceed the
    window-derived cap (the flat-RSS property of the reference's fixed
    trackResults arrays)."""
    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=3)
    n_ms = 2100
    samples = np.asarray(sim.generate(n_ms + 80))
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=2)
    from gnsstpu.runtime.sources import ArraySource

    win_ms = 500
    tlm = Telemetry(sink=io.StringIO())
    mgr = ChannelManager(
        ArraySource(samples), cfg, telemetry=tlm, epoch_ms=100,
        reacq_period_ms=10 ** 9, cn0_drop_dbhz=35.0, prn_pool=[5],
        sync_every=2, history_window_ms=win_ms)

    sizes = []

    def sample(rec):
        if rec.get("type") != "channel_health":
            return
        h = mgr.history.get(5)
        if h:
            sizes.append((sum(len(a) for a in h["i_p"]),
                          len(mgr.records)))

    tlm.subscribe(sample)
    mgr.run(n_ms)                       # > 4 windows of tracking

    assert len(sizes) >= 15
    wb = win_ms // mgr.eng.period_ms    # blocks the window allows
    # Eviction trims whole epoch chunks, so retention may exceed the
    # window by at most one epoch's blocks; records cap is exact.
    bpe = mgr.epoch_ms // mgr.eng.period_ms
    peak_blocks = max(s[0] for s in sizes)
    assert peak_blocks <= wb + bpe
    # (+1: the sampler fires mid-epoch, before that epoch's trim)
    assert max(s[1] for s in sizes) <= win_ms // mgr.epoch_ms + 1
    # Plateau: the last 3 windows' samples never grow past the peak
    # reached by the end of window 2 (flat, not creeping).
    early_peak = max(s[0] for s in sizes[: len(sizes) // 3])
    late = [s[0] for s in sizes[-len(sizes) // 3:]]
    assert max(late) <= early_peak + bpe
    # Eviction really happened (the run is much longer than the window)
    # and absolute indexing is preserved.
    h = mgr.history[5]
    assert h["evicted"] > 0
    assert h["evicted"] + sum(len(a) for a in h["i_p"]) \
        >= (n_ms - 3 * mgr.epoch_ms) // mgr.eng.period_ms


def test_run_clock_continues_across_calls():
    """Successive run() calls form ONE monotonic receiver clock:
    run(400)+run(400) reproduces run(800) bit-exactly (serial
    superepochs) — slot started_ms, reacq schedule, and telemetry
    labels never restart mid-session (the reference's receiver time is
    monotonic for the life of the process)."""
    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0),
            SatParams(prn=12, doppler_hz=-1500.0,
                      code_phase_chips=700.25, cn0_dbhz=46.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(850))
    from gnsstpu.runtime.sources import ArraySource
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=3)

    def mk():
        return ChannelManager(
            ArraySource(samples.copy()), cfg,
            telemetry=Telemetry(sink=io.StringIO()), epoch_ms=100,
            reacq_period_ms=400, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
            sync_every=2)

    m_split = mk()
    m_split.run(400)
    assert m_split.clock_ms == 400
    m_split.run(400)
    assert m_split.clock_ms == 800
    m_whole = mk()
    m_whole.run(800)

    assert len(m_split.records) == len(m_whole.records)
    for a, b in zip(m_whole.records, m_split.records):
        assert a.epoch_ms == b.epoch_ms
        assert np.array_equal(a.prn, b.prn)
        assert np.array_equal(a.cn0_dbhz, b.cn0_dbhz)
    for prn in (5, 12):
        sa = m_whole.prompt_stream(prn)
        sb = m_split.prompt_stream(prn)
        for key in ("i_p", "q_p", "carr_doppler", "abs_sample"):
            assert np.array_equal(sa[key], sb[key]), (prn, key)
