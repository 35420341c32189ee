"""Streaming ingestion: producer thread -> native ring FIFO -> manager.

The reference's FIFO/GPS_Source fabric (objects/fifo.cpp:53-187 ring of
1 ms packets between the radio thread and the correlator;
objects/gps_source.cpp:135) realized as FileStreamProducer + RingFifo +
StreamSource, driven end-to-end by the ChannelManager.
"""

import io
import json
import threading
import time

import numpy as np
import pytest

from gnsstpu import native
from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                            TrackConfig)
from gnsstpu.runtime.manager import ChannelManager
from gnsstpu.runtime.sources import (FileStreamProducer, StreamSource)
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)


def test_stream_source_serves_window_and_blocks_for_producer():
    blk = 64
    fifo = native.RingFifo(depth=8, block_bytes=blk * 8)
    src = StreamSource(fifo, blk, history_blocks=4, timeout_s=5.0)

    def produce():
        for i in range(16):
            b = np.full((blk, 2), float(i), np.float32)
            fifo.push(b.view(np.uint8).reshape(-1), timeout_ms=2000)
        fifo.close()

    t = threading.Thread(target=produce)
    t.start()
    # Read blocks 5..6: must block until produced, then match.
    out = src.read(5 * blk, 2 * blk)
    assert np.all(out[:blk] == 5.0) and np.all(out[blk:] == 6.0)
    # Old data beyond the history ring is zero-filled (overrun).
    src.read(14 * blk, blk)
    old = src.read(0, blk)
    assert np.all(old == 0.0)
    # End of stream: zero-fill, no exception.
    tail = src.read(16 * blk, blk)
    assert np.all(tail == 0.0)
    t.join()
    assert src.stats()["pushed"] == 16


def test_stream_source_stall_raises_timeout():
    """Patience-watchdog signal (objects/patience.cpp:80-104): a stalled
    producer turns into a TimeoutError instead of a silent hang."""
    blk = 32
    fifo = native.RingFifo(depth=4, block_bytes=blk * 8)
    src = StreamSource(fifo, blk, timeout_s=0.3)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        src.read(0, blk)
    assert time.monotonic() - t0 < 5.0
    fifo.close()


def test_manager_runs_off_live_stream(tmp_path):
    """End-to-end: simulated IF file -> producer thread decode ->
    RingFifo -> StreamSource -> ChannelManager acquires and tracks; FIFO
    counters surface in task_health telemetry."""
    sats = [SatParams(prn=9, doppler_hz=-800.0, code_phase_chips=300.5,
                      cn0_dbhz=47.0)]
    n_ms = 500
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=6)
    buf = np.asarray(sim.generate(n_ms + 50))
    path = tmp_path / "if.i8"
    np.clip(buf * 24.0, -127, 127).astype(np.int8).tofile(path)

    blk = SIG.samples_per_code
    fifo = native.RingFifo(depth=128, block_bytes=blk * 8)
    prod = FileStreamProducer(str(path), fifo, blk, fmt="i8_iq").start()
    src = StreamSource(fifo, blk, history_blocks=700, timeout_s=10.0)

    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=3e3, coherent_ms=2, threshold=2.4,
                      prn_list=(9,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=2)
    sink = io.StringIO()
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, reacq_period_ms=10 ** 9)
    recs = mgr.run(n_ms)
    prod.stop()

    last = recs[-1]
    assert 9 in {int(p) for p in last.prn if p}
    i9 = list(last.prn).index(9)
    assert abs(last.doppler_hz[i9] - (-800.0)) < 3.0
    src_msgs = [json.loads(l) for l in sink.getvalue().splitlines()
                if '"stage": "source"' in l]
    assert src_msgs and src_msgs[-1]["pushed"] >= n_ms
    assert src_msgs[-1]["overruns"] == 0


def test_manager_runs_off_udp_socket_stream():
    """Networked front end: a sender streams simulated IF samples as
    i8_iq UDP datagrams; SocketStreamProducer decodes into the ring
    FIFO; the manager acquires and tracks off the live socket
    (GPS_Source role for a network radio, gps_source.cpp:135)."""
    import socket

    from gnsstpu.runtime.sources import SocketStreamProducer

    sats = [SatParams(prn=4, doppler_hz=600.0, code_phase_chips=150.25,
                      cn0_dbhz=47.0)]
    n_ms = 900
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=8)
    samples = np.asarray(sim.generate(n_ms + 40))
    wire = np.clip(np.round(samples * 24.0), -127, 127).astype(np.int8)

    blk = SIG.samples_per_code
    # FIFO deep enough for the whole capture: the CPU test consumer is
    # slower than a real radio, and a non-blocking producer would
    # otherwise (correctly) overrun.
    fifo = native.RingFifo(depth=1024, block_bytes=blk * 8)
    prod = SocketStreamProducer(fifo, blk, fmt="i8_iq",
                                timeout_s=8.0).start()
    src = StreamSource(fifo, blk, history_blocks=1024, timeout_s=8.0)

    def send():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        raw = wire.reshape(-1).tobytes()
        # Deliberately datagram-misaligned chunks (1472-byte MTU-ish):
        # sample framing must survive byte-continuation across packets.
        # Paced in small bursts so the kernel UDP receive buffer never
        # drops (loopback has no flow control).
        step = 1472
        for i in range(0, len(raw), step):
            tx.sendto(raw[i: i + step], ("127.0.0.1", prod.port))
            if i % (step * 16) == 0:
                time.sleep(0.002)
        time.sleep(0.1)
        tx.sendto(b"", ("127.0.0.1", prod.port))
        tx.close()

    t = threading.Thread(target=send)
    t.start()
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=(4,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=1)
    sink = io.StringIO()
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, reacq_period_ms=10 ** 9,
                         prn_pool=[4], sync_every=2)
    recs = mgr.run(800)
    t.join()
    prod.stop()

    last = recs[-1]
    assert int(last.prn[0]) == 4
    assert abs(last.doppler_hz[0] - 600.0) < 5.0
    assert last.cn0_dbhz[0] > 40.0
    # FIFO counters made it into telemetry (doxygen.h:113 display).
    health = [json.loads(l) for l in sink.getvalue().splitlines()
              if '"task_health"' in l and '"source"' in l]
    assert health and health[-1]["pushed"] >= 800


def test_packed_stream_udp_to_manager():
    """End-to-end wire-format streaming: a 2-bit sm2 radio's raw bytes
    cross UDP -> SocketStreamProducer(raw) -> ring FIFO (bytes) ->
    PackedStreamSource -> pipelined manager, which ships them to the
    device UNTOUCHED (device-side unpack). The host never decodes the
    hot path."""
    import socket

    from gnsstpu.ops import unpack as up
    from gnsstpu.runtime.sources import (PackedStreamSource,
                                         SocketStreamProducer)

    sats = [SatParams(prn=6, doppler_hz=-1100.0, code_phase_chips=512.5,
                      cn0_dbhz=47.0)]
    n_ms = 900
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=12)
    samples = np.asarray(sim.generate(n_ms + 40))
    wire = up.pack(samples, "sm2", scale=1.0)     # raw radio bytes

    blk = SIG.samples_per_code
    blk_bytes = up.wire_bytes("sm2", blk)
    fifo = native.RingFifo(depth=1024, block_bytes=blk_bytes)
    prod = SocketStreamProducer(fifo, blk, fmt="sm2", raw=True,
                                timeout_s=8.0).start()
    src = PackedStreamSource(fifo, blk, fmt="sm2",
                             history_blocks=1024, timeout_s=8.0)

    def send():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        raw = wire.tobytes()
        step = 1472
        for i in range(0, len(raw), step):
            tx.sendto(raw[i: i + step], ("127.0.0.1", prod.port))
            if i % (step * 16) == 0:
                time.sleep(0.002)
        time.sleep(0.1)
        tx.sendto(b"", ("127.0.0.1", prod.port))
        tx.close()

    t = threading.Thread(target=send)
    t.start()
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=(6,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=1)
    sink = io.StringIO()
    mgr = ChannelManager(src, cfg, telemetry=Telemetry(sink=sink),
                         epoch_ms=100, reacq_period_ms=10 ** 9,
                         prn_pool=[6], sync_every=2)
    assert mgr.wire == "sm2"                     # packed path engaged
    recs = mgr.run(800)
    t.join()
    prod.stop()

    last = recs[-1]
    assert int(last.prn[0]) == 6
    assert abs(last.doppler_hz[0] + 1100.0) < 5.0
    assert last.cn0_dbhz[0] > 40.0


def test_watchdog_restart_recovers_tracking():
    """Patience RECOVERY (reference patience.cpp:80-104
    Stop -> ResetSource -> Start): a producer that stalls mid-run is
    restarted via the source's restart hook; the manager emits one
    watchdog_restart event, re-anchors its channels at the stream head,
    re-acquires, and ends the run tracking."""
    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0),
            SatParams(prn=12, doppler_hz=-1500.0,
                      code_phase_chips=700.25, cn0_dbhz=46.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=3)
    blk = SIG.samples_per_code
    fifo = native.RingFifo(depth=256, block_bytes=blk * 8)
    n_ms = 2000
    stall_at = 700

    def produce(ms0, ms1):
        def run():
            for m in range(ms0, ms1):
                b = np.asarray(sim.generate(1, m), np.float32)
                if fifo.push(b.view(np.uint8).reshape(-1),
                             timeout_ms=5000) != 1:
                    return
            if ms1 >= n_ms + 50:
                fifo.close()
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    produce(0, stall_at)          # first producer: stalls, never closes

    def factory():
        return produce(stall_at, n_ms + 50)

    src = StreamSource(fifo, blk, timeout_s=1.0).set_restart(factory)
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3)
    sink = io.StringIO()
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=sink), epoch_ms=100,
        reacq_period_ms=300, cn0_drop_dbhz=35.0, prn_pool=[5, 12],
        sync_every=2)
    recs = mgr.run(n_ms)

    evs = [json.loads(l) for l in sink.getvalue().splitlines()]
    restarts = [e for e in evs if e.get("what") == "watchdog_restart"]
    assert len(restarts) == 1 and src.restarts == 1
    drops = [e for e in evs if e.get("what") == "channel_drop"
             and e.get("why") == "watchdog_restart"]
    assert len(drops) == 2
    # Channels re-acquired after the restart and track at the end.
    t_restart = restarts[0]["epoch_ms"]
    re_starts = [e for e in evs if e.get("what") == "channel_start"
                 and e["epoch_ms"] > t_restart]
    assert {e["prn"] for e in re_starts} == {5, 12}
    last = recs[-1]
    assert {int(p) for p in last.prn if p} == {5, 12}


def test_live_resampling_producer_tracks(tmp_path):
    """Decimate-on-ingest (reference Resample_USRP_V1 role,
    gps_source.cpp:436,566): a 4.096 Msps i8 IQ file streams through
    the producer's polyphase resampler to the receiver's 2.048 Msps;
    the manager acquires and tracks the correct Doppler through the
    live resampled stream."""
    fs_in = 4.096e6
    sig_in = SignalConfig(if_freq=0.0, fs=fs_in, complex_iq=True)
    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0),
            SatParams(prn=12, doppler_hz=-1500.0,
                      code_phase_chips=700.25, cn0_dbhz=46.0)]
    sim = IFSimulator(sig_in, sats, noise_sigma=1.0, seed=3)
    raw = np.asarray(sim.generate(1000))
    i8 = np.clip(np.round(raw * 18.0), -127, 127).astype(np.int8)
    path = tmp_path / "hi_rate.bin"
    i8.reshape(-1).tofile(path)

    blk = SIG.samples_per_code               # 2048 @ 2.048 Msps
    fifo = native.RingFifo(depth=256, block_bytes=blk * 8)
    FileStreamProducer(str(path), fifo, blk, fmt="i8_iq",
                       fs_in=fs_in, fs_out=SIG.fs).start()
    src = StreamSource(fifo, blk, timeout_s=20.0)
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0),
        n_channels=3)
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, reacq_period_ms=400, cn0_drop_dbhz=35.0,
        prn_pool=[5, 12], sync_every=2)
    recs = mgr.run(900)
    last = recs[-1]
    live = {int(p) for p in last.prn if p}
    assert live == {5, 12}
    i5 = list(last.prn).index(5)
    i12 = list(last.prn).index(12)
    assert abs(last.doppler_hz[i5] - 900.0) < 5.0
    assert abs(last.doppler_hz[i12] + 1500.0) < 5.0
    assert last.cn0_dbhz[i5] > 38.0


def test_tcp_stream_to_manager():
    """Connection-oriented network front end: raw 2-bit sm2 bytes over
    TCP -> TcpStreamProducer(raw) -> ring FIFO -> PackedStreamSource ->
    pipelined manager with device-side unpack; tracking acquires and
    holds the right Doppler, and peer close ends the run cleanly."""
    import socket

    from gnsstpu.ops import unpack as up
    from gnsstpu.runtime.sources import (PackedStreamSource,
                                         TcpStreamProducer)

    sats = [SatParams(prn=6, doppler_hz=-1100.0, code_phase_chips=512.5,
                      cn0_dbhz=47.0)]
    n_ms = 900
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=12)
    samples = np.asarray(sim.generate(n_ms + 40))
    wire = up.pack(samples, "sm2", scale=1.0)

    blk = SIG.samples_per_code
    blk_bytes = up.wire_bytes("sm2", blk)
    fifo = native.RingFifo(depth=1024, block_bytes=blk_bytes)
    prod = TcpStreamProducer(fifo, blk, fmt="sm2", raw=True,
                             timeout_s=8.0).start()
    src = PackedStreamSource(fifo, blk, fmt="sm2",
                             history_blocks=1024, timeout_s=8.0)

    def send():
        tx = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        tx.connect(("127.0.0.1", prod.port))
        tx.sendall(wire.tobytes())
        tx.close()                      # EOS

    threading.Thread(target=send, daemon=True).start()

    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(6,), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=2)
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=100, reacq_period_ms=400, cn0_drop_dbhz=35.0,
        prn_pool=[6], sync_every=4)
    recs = mgr.run(800)
    assert mgr.wire == "sm2"
    last = recs[-1]
    assert 6 in {int(p) for p in last.prn if p}
    i6 = list(last.prn).index(6)
    assert abs(last.doppler_hz[i6] + 1100.0) < 5.0


def test_cli_listen_tcp_tracks():
    """CLI surface of the radio seam (docs/RADIO_FRONTEND.md):
    `gnsstpu track --listen tcp:0 --listen-fmt sm2` ingests packed
    2-bit IF bytes from a TCP sender (the radio-process stand-in) and
    tracks — the full network front end driven end-to-end from the
    command line."""
    import socket
    import subprocess
    import sys

    from gnsstpu.ops import unpack as up

    sats = [SatParams(prn=6, doppler_hz=-1100.0, code_phase_chips=512.5,
                      cn0_dbhz=47.0)]
    n_ms = 900
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=12)
    samples = np.asarray(sim.generate(n_ms + 40))
    wire = up.pack(samples, "sm2", scale=1.0)

    proc = subprocess.Popen(
        [sys.executable, "-m", "gnsstpu", "track",
         "--listen", "tcp:0", "--listen-fmt", "sm2",
         "--fs", "2.048e6", "--if-freq", "0", "--ms", "800",
         "--band", "6e3", "--coherent", "2", "--threshold", "2.4",
         "--channels", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo")
    try:
        port = None
        for _ in range(50):
            line = proc.stderr.readline()
            if "listening for IF samples" in line:
                port = int(line.split(":")[-1].split()[0].rstrip(")"))
                break
        assert port, "no listening banner"

        def send():
            tx = socket.create_connection(("127.0.0.1", port),
                                          timeout=10)
            tx.sendall(wire.tobytes())
            tx.close()

        t = threading.Thread(target=send, daemon=True)
        t.start()
        out, err = proc.communicate(timeout=560)
        assert proc.returncode == 0, err
        assert "live PRNs at end: [6]" in out, (out, err)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_producer_exits_when_consumer_closes_fifo(tmp_path):
    """A FileStreamProducer blocked on a full FIFO must EXIT (not
    busy-spin) when the CONSUMER side closes the ring: fifo_push_wait
    returns -1 without waiting once closed (ring_fifo.cpp:85), so the
    lossless retry loop must treat -1 as permanent and only retry 0
    (timeout). Before the fix the daemon thread spun at 100% CPU until
    producer.stop() — which a consumer-teardown path never calls."""
    path = tmp_path / "if.i8"
    np.zeros(2048 * 400 * 2, np.int8).tofile(path)     # 400 ms i8 IQ
    blk = SIG.samples_per_code
    fifo = native.RingFifo(depth=4, block_bytes=blk * 8)
    prod = FileStreamProducer(str(path), fifo, blk, fmt="i8_iq").start()
    t0 = time.monotonic()
    while (fifo.stats()["count"] < 4
           and time.monotonic() - t0 < 5.0):
        time.sleep(0.01)               # let it fill + block in push
    fifo.close()                        # consumer teardown, NOT stop()
    prod.thread.join(timeout=3.0)
    assert not prod.thread.is_alive()
