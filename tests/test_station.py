"""Interactive ground station (runtime.station) tests.

The reference's gse ground station plots live channels and sends
commands back into the receiver over a pipe (gse/src/,
objects/commando.cpp). These tests drive the headless station core
against a LIVE ChannelManager: telemetry flows receiver -> JSONL ->
station, and an operator 'drop' command flows station -> command file ->
CommandBus -> manager, which tears the channel down mid-run.
"""

import json
import threading

import numpy as np

from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                            TrackConfig)
from gnsstpu.runtime.console import CommandBus
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.sources import ArraySource
from gnsstpu.runtime.station import GroundStation, sparkline
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)


def test_sparkline_shapes():
    assert sparkline([], 0, 1) == ""
    s = sparkline([0.0, 0.5, 1.0, 2.0, -1.0], 0.0, 1.0)
    assert len(s) == 5
    assert s[0] == "▁" and s[2] == "█" and s[3] == "█" and s[4] == "▁"


def test_station_command_roundtrip(tmp_path):
    """Live loop: manager emits telemetry to a file the station tails;
    the operator types ':drop 12' in the station; the manager polls the
    command file and drops the channel."""
    log = tmp_path / "telemetry.jsonl"
    cmds = tmp_path / "commands.jsonl"
    cmds.write_text("")

    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.5,
                      cn0_dbhz=47.0),
            SatParams(prn=12, doppler_hz=-1500.0,
                      code_phase_chips=700.25, cn0_dbhz=46.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=3)
    samples = np.asarray(sim.generate(1250))
    cfg = ReceiverConfig(
        signal=SIG,
        acq=AcqConfig(doppler_band=6e3, coherent_ms=2, threshold=2.4,
                      prn_list=(5, 12), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0), n_channels=3)

    station = GroundStation(str(log), command_path=str(cmds))
    sent = threading.Event()

    with open(log, "w", buffering=1) as sink:
        tlm = Telemetry(sink=sink)

        # Operator-side: once both channels show up in the tailed
        # telemetry, type the drop command for PRN 12.
        def operator(rec):
            station.pump()
            live = {c.get("prn") for c in station.board.channels.values()}
            if {5, 12} <= live and not sent.is_set():
                for k in ":drop 12":
                    station.handle_key(k)
                station.handle_key("ENTER")
                sent.set()

        tlm.subscribe(operator)
        mgr = ChannelManager(
            ArraySource(samples), cfg, telemetry=tlm, epoch_ms=100,
            reacq_period_ms=10 ** 9, cn0_drop_dbhz=35.0,
            prn_pool=[5, 12], commands=CommandBus(str(cmds)),
            sync_every=2)
        mgr.run(1200)

    assert sent.is_set()
    # The command landed in the file in CommandBus dialect...
    lines = [json.loads(l) for l in cmds.read_text().splitlines()]
    assert {"cmd": "drop", "prn": 12} in lines
    # ...the manager executed it (slot idle, PRN 5 still tracking)...
    states = {s.prn: s.state for s in mgr.slots}
    assert states.get(5) is SlotState.TRACKING
    assert 12 not in states or states.get(12) is SlotState.IDLE
    # ...and the station's final render reflects the world.
    station.pump()
    out = station.render()
    assert " 5" in out
    assert station.cn0_hist              # sparkline history accumulated
    station.handle_key("TAB")
    assert station.page_idx == 1
    station.handle_key(str(station.PAGES.index("events") + 1))
    page4 = station.render()
    assert "channel_drop" in page4       # events page shows the drop


def test_station_rejects_bad_command(tmp_path):
    log = tmp_path / "t.jsonl"
    log.write_text("")
    st = GroundStation(str(log), command_path=str(tmp_path / "c.jsonl"))
    assert not st.submit("frobnicate 7")
    assert "??" in st.message
    assert st.submit("set cn0_drop 30")
    assert json.loads((tmp_path / "c.jsonl").read_text()) == {
        "cmd": "set", "key": "cn0_drop", "v": 30.0}


def test_station_tcp_transport():
    """Remote station link (runtime.remote): telemetry fans out over a
    localhost TCP socket (the reference's serial/remote transport,
    objects/telemetry.cpp:193) and an operator command rides the same
    connection back into a CommandBus-compatible queue."""
    import time

    from gnsstpu.runtime.remote import StationServer

    srv = StationServer()
    try:
        tlm = Telemetry(sink=None)
        srv.attach(tlm)
        station = GroundStation(f"tcp://127.0.0.1:{srv.port}")
        station.pump()                       # connects
        deadline = time.time() + 5.0
        while srv.n_clients() == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert srv.n_clients() == 1

        # Receiver -> station: channel health + an event arrive live.
        tlm.channel_health(100, 2, 7, "tracking", 45.2, 1234.5, 0.98,
                           ip_abs=900.0, qp_abs=40.0)
        tlm.event(100, "channel_start", chan=2, prn=7)
        got = 0
        deadline = time.time() + 5.0
        while got < 2 and time.time() < deadline:
            got += station.pump()
            time.sleep(0.01)
        assert got == 2
        assert station.board.channels[2]["prn"] == 7
        assert station.cn0_hist[2][-1] == 45.2

        # Station -> receiver: ':drop 7' rides the socket back.
        for k in ":drop 7":
            station.handle_key(k)
        station.handle_key("ENTER")
        assert "sent" in station.message
        cmds = []
        deadline = time.time() + 5.0
        while not cmds and time.time() < deadline:
            cmds = srv.commands.poll()
            time.sleep(0.01)
        assert cmds == [{"cmd": "drop", "prn": 7}]

        # Render still works over the remote link.
        assert " 7" in station.render()
        station._link.close()
    finally:
        srv.close()


def test_station_tcp_link_down_detected():
    """A dropped receiver link is detected (peer EOF), surfaced to the
    operator, and the station re-arms for reconnect instead of
    freezing on stale pages."""
    import time

    from gnsstpu.runtime.remote import StationServer

    srv = StationServer()
    tlm = Telemetry(sink=None)
    srv.attach(tlm)
    station = GroundStation(f"tcp://127.0.0.1:{srv.port}")
    station.pump()
    deadline = time.time() + 5.0
    while srv.n_clients() == 0 and time.time() < deadline:
        time.sleep(0.01)
    tlm.event(0, "channel_start", chan=0, prn=3)
    deadline = time.time() + 5.0
    got = 0
    while not got and time.time() < deadline:
        got = station.pump()
        time.sleep(0.01)
    assert got == 1

    srv.close()                           # receiver goes away
    deadline = time.time() + 5.0
    while station._link is not None and time.time() < deadline:
        station.pump()
        time.sleep(0.01)
    assert station._link is None
    assert "link down" in station.message


def test_station_server_send_never_blocks():
    """A stalled station client must not stall telemetry emission: the
    per-client queue drops records once full (counted) and emit returns
    immediately (reference: non-blocking GUI pipe drops writes)."""
    import socket
    import time

    from gnsstpu.runtime.remote import StationServer, _Client

    # Unit-level: a socketpair whose reader never reads, tiny queue.
    a, b = socket.socketpair()
    a.settimeout(0.2)
    c = _Client(a, max_queue=4)
    big = b"x" * 65536 + b"\n"
    t0 = time.time()
    for _ in range(500):
        c.offer(big)
    assert time.time() - t0 < 1.0         # never blocked on the socket
    assert c.dropped > 0
    c.close()
    b.close()

    # Server-level: emit with a present-but-stalled client stays fast.
    srv = StationServer()
    try:
        rx = socket.create_connection(("127.0.0.1", srv.port))
        deadline = time.time() + 5.0
        while srv.n_clients() == 0 and time.time() < deadline:
            time.sleep(0.01)
        t0 = time.time()
        for i in range(2000):
            srv.send({"type": "event", "i": i, "pad": "y" * 300})
        assert time.time() - t0 < 2.0
        rx.close()
    finally:
        srv.close()


def test_parse_tcp_url_validation():
    import pytest

    from gnsstpu.runtime.remote import parse_tcp_url

    assert parse_tcp_url("/a/file.jsonl") is None
    assert parse_tcp_url("tcp://h:123") == ("h", 123)
    assert parse_tcp_url("tcp://:9") == ("127.0.0.1", 9)
    with pytest.raises(ValueError):
        parse_tcp_url("tcp://hostonly")
