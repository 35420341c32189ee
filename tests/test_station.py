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
