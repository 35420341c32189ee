"""Operator console tests: command channel + status board.

Covers the reference's Commando runtime-command execution
(objects/commando.cpp: set-parameter / reset commands over the GUI pipe)
and the console status page (osgnss display.c, gse channel page).
"""

import io
import json

import numpy as np

from gnsstpu.config import AcqConfig, ReceiverConfig, SignalConfig
from gnsstpu.runtime.console import CommandBus, StatusBoard
from gnsstpu.runtime.manager import ChannelManager, SlotState
from gnsstpu.runtime.sources import SimSource
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.sim import IFSimulator, SatParams

SIG = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)


def make_mgr(commands=None, sink=None, n_ms=1200, **kw):
    sats = [SatParams(prn=5, doppler_hz=900.0, code_phase_chips=200.0,
                      cn0_dbhz=48.0),
            SatParams(prn=11, doppler_hz=-1500.0, code_phase_chips=700.0,
                      cn0_dbhz=47.0)]
    sim = IFSimulator(SIG, sats, noise_sigma=1.0, seed=4)
    cfg = ReceiverConfig(signal=SIG, acq=AcqConfig(coherent_ms=2),
                         n_channels=3)
    return ChannelManager(SimSource(sim, n_ms), cfg,
                          telemetry=Telemetry(sink=sink),
                          epoch_ms=100, prn_pool=[5, 11],
                          commands=commands, **kw)


def test_command_bus_polls_incrementally(tmp_path):
    p = tmp_path / "cmd.jsonl"
    bus = CommandBus(str(p))
    assert bus.poll() == []
    p.write_text('{"cmd": "mask", "prn": 3}\n')
    assert bus.poll() == [{"cmd": "mask", "prn": 3}]
    assert bus.poll() == []          # already consumed
    with open(p, "a") as f:
        f.write('{"cmd": "stop"}\nnot json\n')
    cmds = bus.poll()
    assert cmds[0] == {"cmd": "stop"}
    assert cmds[1]["cmd"] == "_parse_error"


def test_manager_executes_mask_and_stop_commands():
    feed = io.StringIO()

    class ScriptedBus:
        def __init__(self):
            self.step = 0

        def poll(self):
            self.step += 1
            if self.step == 4:       # after tracking is established
                return [{"cmd": "mask", "prn": 11}]
            if self.step == 7:
                return [{"cmd": "stop"}]
            return []

    mgr = make_mgr(commands=ScriptedBus(), sink=feed)
    recs = mgr.run(1200)
    # PRN 11 masked: dropped and never re-acquired
    assert 11 not in {s.prn for s in mgr.slots
                      if s.state is SlotState.TRACKING}
    assert 11 not in mgr.pool
    # stop command ended the run early (12 epochs would run otherwise)
    assert len(recs) < 8
    log = feed.getvalue()
    assert "masked" in log and "commanded_stop" in log


def test_manager_set_command():
    class OneShot:
        done = False

        def poll(self):
            if not self.done:
                self.done = True
                return [{"cmd": "set", "key": "cn0_drop", "v": 35.5},
                        {"cmd": "bogus"}]
            return []

    feed = io.StringIO()
    mgr = make_mgr(commands=OneShot(), sink=feed)
    mgr.run(300)
    assert mgr.cn0_drop == 35.5
    assert "command_rejected" in feed.getvalue()


def test_status_board_renders_channels_and_events():
    feed = io.StringIO()
    mgr = make_mgr(sink=feed)
    mgr.run(800)
    board = StatusBoard()
    for line in feed.getvalue().splitlines():
        board.update(json.loads(line))
    page = board.render()
    assert "gnsstpu channels" in page
    assert "  5  tracking" in page.replace("   ", "  ") or "5" in page
    # at least one live PRN renders with plausible C/N0
    live = [rec for rec in board.channels.values() if rec.get("prn")]
    assert any(35.0 < rec["cn0_dbhz"] < 60.0 for rec in live)
    assert any("channel_start" in (e.get("what") or "")
               for e in board.events) or board.channels


def test_status_board_pages():
    """gse-notebook-style pages: channels, pvt (history), health (stage
    timers + FIFO counters), events."""
    from gnsstpu.runtime.console import StatusBoard

    b = StatusBoard()
    b.update({"type": "channel_health", "epoch_ms": 100, "chan": 0,
              "prn": 7, "state": "tracking", "cn0_dbhz": 45.2,
              "doppler_hz": 1234.5, "pll_lock": 0.91})
    for e in range(3):
        b.update({"type": "task_health", "epoch_ms": 100 * e,
                  "stage": "track", "wall_s": 0.002 * (e + 1)})
    b.update({"type": "task_health", "epoch_ms": 200, "stage": "source",
              "wall_s": 0.0, "count": 3, "pushed": 200, "popped": 197,
              "overruns": 1})
    b.update({"type": "pvt", "epoch_ms": 300, "lat_deg": 57.1,
              "lon_deg": 9.9, "h_m": 48.2, "n_sv": 6})
    b.update({"type": "event", "epoch_ms": 300, "what": "channel_start",
              "chan": 1, "prn": 12})

    ch = b.render("channels")
    assert "PRN" not in ch and " 7" in ch and "45.2" in ch
    pv = b.render("pvt")
    assert "57.1" in pv and "6" in pv
    he = b.render("health")
    assert "track" in he and "overruns 1" in he and "mean" in he
    ev = b.render("events")
    assert "channel_start" in ev
    assert all(p in b.render_all() for p in ("channels", "health"))


def test_eph_browser_page():
    """The 'eph' console page (gse gui_ephemeris analogue) lists the
    orbit headline fields carried by ephemeris_decoded events."""
    from gnsstpu.runtime.console import StatusBoard

    b = StatusBoard()
    b.update({"type": "event", "epoch_ms": 8200,
              "what": "ephemeris_decoded", "prn": 7,
              "sqrtA": 5153.712, "e": 0.0123, "t_oe": 266400,
              "IODC": 421})
    b.update({"type": "event", "epoch_ms": 9000,
              "what": "ephemeris_decoded", "prn": 12,
              "x": 10816.36, "y": 1905.12, "z": 23013.63, "tb": 675})
    page = b.render("eph")
    assert "prn   7" in page and "sqrtA=5153.712" in page
    assert "prn  12" in page and "tb=675" in page
    assert "eph" in b.render_all()


def test_ekf_page_round_trips_records():
    """'ekf' page (gse gui_ekf twin): EKF telemetry records render as
    the filtered state table."""
    from gnsstpu.runtime.console import StatusBoard

    b = StatusBoard()
    assert "no EKF" in b.render("ekf")
    for k in range(3):
        b.update({"type": "ekf", "epoch_ms": 500 * k,
                  "x": 3427947.0 + k, "y": 603774.0, "z": 5326967.0,
                  "vx": 0.1 * k, "vy": -0.2, "vz": 0.05,
                  "clk_m": 12.5, "clk_drift_ms": 0.031,
                  "n_used": 6, "p_pos": 3.2})
    pg = b.render("ekf")
    assert "3427949" in pg and "clk 12.5 m" in pg and "sigma_pos 3.2" in pg
    assert len(b.ekf_history) == 3
    assert "ekf" in StatusBoard.PAGES


def test_pvt_page_enu_scatter():
    """PVT history page shows E/N offsets + scatter summary (gse
    gui_pvt scatter role)."""
    from gnsstpu.runtime.console import StatusBoard

    b = StatusBoard()
    for k in range(6):
        b.update({"type": "pvt", "epoch_ms": 500 * k,
                  "lat_deg": 57.1 + 1e-6 * k, "lon_deg": 9.9,
                  "h_m": 48.2, "n_sv": 6})
    pg = b.render("pvt")
    assert "dE [m]" in pg and "sigmaE" in pg and "span" in pg
    enu = b.pvt_enu()
    assert len(enu) == 6
    # 1e-6 deg latitude steps ~ 0.111 m north steps.
    assert abs(enu[-1][1] - 5 * 0.1113195) < 1e-3


def test_alm_page_sky_view():
    """The alm page renders per-SV az/el/Doppler from the navigator's
    sv_visibility events (gse gui_almanac az/el display)."""
    from gnsstpu.runtime.console import StatusBoard

    b = StatusBoard()
    b.update({"type": "event", "epoch_ms": 12000,
              "what": "almanac_decoded", "prn_src": 5,
              "new": [7, 9], "entries": [7, 9], "iono_utc": True})
    b.update({"type": "event", "epoch_ms": 12000,
              "what": "sv_visibility",
              "sats": [[7, 123.4, 55.2, -1800.0, 1],
                       [9, 301.0, 4.9, 2100.5, 0]]})
    pg = b.render("alm")
    assert "123.4" in pg and "55.2" in pg and "+2100.5" in pg
    assert "*" in pg and "-" in pg


def test_prefetch_mode_executes_commands():
    """Commando in the prefetch pipeline: mask lands (applied before
    the next dispatch; supervision lag means the drop shows one
    superepoch later than serial) and stop ends the run early."""
    feed = io.StringIO()

    class ScriptedBus:
        def __init__(self):
            self.step = 0

        def poll(self):
            self.step += 1
            if self.step == 2:       # after the first superepoch
                return [{"cmd": "mask", "prn": 11}]
            if self.step == 4:
                return [{"cmd": "stop"}]
            return []

    mgr = make_mgr(commands=ScriptedBus(), sink=feed, n_ms=2600,
                   sync_every=4, prefetch=True)
    recs = mgr.run(2400)
    assert 11 not in {s.prn for s in mgr.slots
                      if s.state is SlotState.TRACKING}
    assert 11 not in mgr.pool
    assert len(recs) < 24            # stop ended the run early
    log = feed.getvalue()
    assert "masked" in log and "commanded_stop" in log
