"""Command-line interface: acquire / track / solve / simulate / bench.

The framework's operator surface — the role of the reference's run scripts
and argv handling (Scilab init.sce entry, realtime main/init.cpp:104-224
Parse_Arguments with source/mode flags). Subcommands:

  simulate  — synthesize an IF file from a scenario (the framework's
              glonass_l3_generator.sce equivalent, any registered signal)
  acquire   — cold FFT search on an IF file, print per-PRN results
  track     — acquire + track n ms, write a JSONL telemetry log and an
              optional checkpoint
  solve     — full chain to a position fix (GPS L1)
  bench     — run the repo benchmark

Usage: python -m gnsstpu <subcommand> [...], see --help per subcommand.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _sig_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--signal", default="gps_l1ca")
    p.add_argument("--fs", type=float, default=16.0e6)
    p.add_argument("--if-freq", type=float, default=2.42e6)
    p.add_argument("--format", default="i8_iq",
                   choices=["i8_iq", "i8", "i16_iq", "c64"])
    p.add_argument("--skip-samples", type=int, default=0)
    p.add_argument("--source-fs", type=float, default=None,
                   help="raw file sample rate; when it differs from --fs "
                        "the stream is rate-converted on the fly (the "
                        "reference resamples every front end to 2.048 "
                        "Msps, gps_source.cpp:436)")
    p.add_argument("--resample-mode", default="polyphase",
                   choices=["polyphase", "nearest"])


def _file_source(args):
    from gnsstpu.ops.resample import ResampledSource
    from gnsstpu.runtime.sources import FileSource

    src = FileSource(args.file, fmt=args.format,
                     skip_samples=args.skip_samples)
    if args.source_fs and args.source_fs != args.fs:
        src = ResampledSource(src, args.source_fs, args.fs,
                              mode=args.resample_mode)
    return src


def _sig_config(args):
    from gnsstpu.config import SignalConfig
    from gnsstpu.signals.registry import get_signal

    sd = get_signal(args.signal)
    return SignalConfig(signal=args.signal, fs=args.fs,
                        if_freq=args.if_freq, code_freq=sd.code_freq,
                        code_length=sd.code_length)


def _acq_config(args):
    from gnsstpu.config import AcqConfig

    return AcqConfig(doppler_band=args.band, coherent_ms=args.coherent,
                     noncoherent=args.noncoherent,
                     threshold=args.threshold,
                     fine_doppler_ms=args.fine_doppler)


def _acq_args(p):
    p.add_argument("--band", type=float, default=14e3)
    p.add_argument("--coherent", type=int, default=2)
    p.add_argument("--noncoherent", type=int, default=1)
    p.add_argument("--threshold", type=float, default=2.5)
    p.add_argument("--fine-doppler", type=int, default=10)


def cmd_acquire(args) -> int:
    from gnsstpu.acquisition import acquire
    from gnsstpu.acquisition.search import acq_samples_needed, acquire_fdma
    from gnsstpu.signals.registry import get_signal

    sig = _sig_config(args)
    acq = _acq_config(args)
    src = _file_source(args)
    samples = src.read(0, acq_samples_needed(sig, acq))
    fn = acquire_fdma if get_signal(args.signal).fdma_zero_prn else acquire
    res = fn(samples, sig, acq)
    for i in np.argsort(-res.peak_metric):
        if res.peak_metric[i] < 1.5:
            continue
        print(json.dumps({
            "prn": int(i) + 1, "metric": round(float(res.peak_metric[i]), 2),
            "detected": bool(res.detected[i]),
            "code_phase": int(res.code_phase[i]),
            "carr_freq_hz": round(float(res.carr_freq[i]), 1)}))
    return 0


def cmd_track(args) -> int:
    from gnsstpu.config import ReceiverConfig, TrackConfig
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.telemetry import Telemetry

    sig = _sig_config(args)
    cfg = ReceiverConfig(signal=sig, acq=_acq_config(args),
                         track=TrackConfig(dll_bw=args.dll_bw),
                         n_channels=args.channels)
    if getattr(args, "listen", None):
        # Network front end (docs/RADIO_FRONTEND.md): a radio process
        # writes IF bytes to this port; packed ops.unpack formats ride
        # the FIFO untouched and unpack on device.
        from gnsstpu import native
        from gnsstpu.ops import unpack as up
        from gnsstpu.runtime.sources import (PackedStreamSource,
                                             SocketStreamProducer,
                                             StreamSource,
                                             TcpStreamProducer)
        proto, _, port = args.listen.partition(":")
        if proto not in ("tcp", "udp"):
            raise SystemExit(f"--listen {args.listen!r}: use tcp:PORT "
                             "or udp:PORT")
        fmt = args.listen_fmt
        raw = fmt in up.WIRE_FORMATS
        blk = sig.samples_per_code
        blk_bytes = up.wire_bytes(fmt, blk) if raw else blk * 8
        fifo = native.RingFifo(depth=1024, block_bytes=blk_bytes)
        cls = TcpStreamProducer if proto == "tcp" \
            else SocketStreamProducer
        prod = cls(fifo, blk, fmt=fmt, raw=raw, host="0.0.0.0",
                   port=int(port or 0), timeout_s=30.0).start()
        print(f"listening for IF samples on {proto}://0.0.0.0:"
              f"{prod.port} ({fmt}{', device unpack' if raw else ''})",
              file=sys.stderr)
        if raw:
            src = PackedStreamSource(fifo, blk, fmt=fmt,
                                     history_blocks=1024,
                                     timeout_s=30.0)
        else:
            src = StreamSource(fifo, blk, history_blocks=1024,
                               timeout_s=30.0)
    elif args.file is None:
        raise SystemExit("track: provide an IF FILE or --listen")
    elif args.stream:
        # Live pipeline: producer thread -> native ring FIFO ->
        # StreamSource (reference FIFO/GPS_Source fabric,
        # objects/fifo.cpp:53-187, gps_source.cpp:135).
        from gnsstpu import native
        from gnsstpu.runtime.sources import (FileStreamProducer,
                                             StreamSource)
        blk = sig.samples_per_code
        fifo = native.RingFifo(depth=256, block_bytes=blk * 8)
        src_fs = getattr(args, "source_fs", 0.0) or 0.0
        FileStreamProducer(
            args.file, fifo, blk, fmt=args.format,
            realtime_fs=(sig.fs if args.stream == "realtime" else 0.0),
            skip_samples=args.skip_samples,
            fs_in=src_fs, fs_out=(sig.fs if src_fs else 0.0),
            resample_mode=getattr(args, "resample_mode",
                                  "polyphase")).start()
        src = StreamSource(fifo, blk)
    else:
        src = _file_source(args)
    sink = open(args.log, "w") if args.log else sys.stdout
    bus = None
    if args.commands:
        from gnsstpu.runtime.console import CommandBus
        bus = CommandBus(args.commands)
    srv = None
    tlm = Telemetry(sink=sink)
    if getattr(args, "station_port", None) is not None:
        # Remote station transport (runtime.remote): telemetry fans out
        # over TCP and station commands ride the same socket back —
        # `gnsstpu monitor --log tcp://host:PORT --interactive`
        # monitors/commands this receiver from another machine (the
        # reference's serial-telemetry role, objects/telemetry.cpp:193).
        from gnsstpu.runtime.remote import StationServer
        srv = StationServer(host="0.0.0.0", port=args.station_port)
        srv.attach(tlm)
        print(f"station server on tcp://0.0.0.0:{srv.port}",
              file=sys.stderr)
        if bus is None:
            bus = srv.commands
        else:
            file_bus = bus

            class _MergedBus:
                def poll(self):
                    return file_bus.poll() + srv.commands.poll()
            bus = _MergedBus()
    navr = None
    if args.navigate:
        from gnsstpu.config import NavConfig
        from gnsstpu.runtime.navigator import OnlineNavigator
        navcfg = NavConfig(use_iono=args.use_iono,
                           carrier_smoothing_s=args.carrier_smoothing)
        navr = OnlineNavigator(sig, navcfg, mode=args.navigate,
                               phase_rate=args.phase_rate)
        if args.assist and os.path.exists(args.assist):
            seed_pos = seed_t = None
            if args.assist_seed:
                vals = [float(v) for v in args.assist_seed.split(",")]
                seed_pos, seed_t = vals[:3], vals[3]
            navr.load_assist(args.assist, seed_pos=seed_pos,
                             seed_t=seed_t)
    mesh = None
    if getattr(args, "mesh", None):
        # Multi-chip receiver: '--mesh channel=4' (or 'channel=2,time=2')
        # builds a jax Mesh and the manager shards the slot bank +
        # tracking state over the channel axis (ChannelManager mesh=).
        from gnsstpu.parallel import make_mesh
        axes = [(kv.split("=")[0], int(kv.split("=")[1]))
                for kv in args.mesh.split(",")]
        mesh = make_mesh(axes)
    mgr = ChannelManager(src, cfg, telemetry=tlm,
                         epoch_ms=args.epoch_ms, commands=bus,
                         engine=args.engine, navigator=navr,
                         sync_every=args.sync_every,
                         prefetch=args.prefetch,
                         readback=args.readback,
                         history_window_ms=args.history_window_ms,
                         mesh=mesh)
    if args.resume:
        mgr.restore_checkpoint(args.resume)
    if args.profile:
        # Opt-in JAX profiler trace (SURVEY §5 tracing: the reference's
        # Threaded_Object tic counters; here a real xplane trace).
        import jax
        with jax.profiler.trace(args.profile):
            recs = mgr.run(args.ms)
    else:
        recs = mgr.run(args.ms)
    if args.checkpoint:
        mgr.save_checkpoint(args.checkpoint)
    if navr is not None and args.assist and navr.almanac:
        navr.save_assist(args.assist)
    if srv is not None:
        srv.close()
    if args.log:
        sink.close()
    live = [int(p) for p in (recs[-1].prn if recs else []) if p]
    print(f"tracked {args.ms} ms; live PRNs at end: {live}")
    return 0


def cmd_solve(args) -> int:
    from gnsstpu.config import AcqConfig, ReceiverConfig
    from gnsstpu.runtime.receiver import run_receiver

    sig = _sig_config(args)
    cfg = ReceiverConfig(signal=sig, acq=_acq_config(args),
                         n_channels=args.channels, ms_to_process=args.ms)
    src = _file_source(args)
    out = run_receiver(src, cfg, n_ms=args.ms)
    print(f"acquired: {out.acq.detected_prns()}")
    print(f"ephemerides decoded: {sorted(out.ephs)}")
    if args.log and out.nav is not None:
        # Emit the solution stream as telemetry (SPS/PVT message family,
        # reference messages.h) so `gnsstpu monitor --page pvt` and
        # `gnsstpu analyze` work on offline solves too.
        from gnsstpu.runtime.telemetry import Telemetry

        with open(args.log, "w") as f:
            tlm = Telemetry(sink=f)
            n = out.nav
            for k in range(len(n.t_ms)):
                if not n.valid[k]:
                    continue
                tlm.pvt(int(n.t_ms[k]), float(n.latitude[k]),
                        float(n.longitude[k]), float(n.height[k]),
                        int(n.n_sats[k]),
                        gdop=round(float(n.dop[k, 0]), 2),
                        hdop=round(float(n.dop[k, 2]), 2))
    if out.nav is not None and np.any(out.nav.valid):
        v = out.nav.valid
        print(json.dumps({
            "lat_deg": float(np.mean(out.nav.latitude[v])),
            "lon_deg": float(np.mean(out.nav.longitude[v])),
            "h_m": float(np.mean(out.nav.height[v])),
            "epochs": int(np.sum(v))}))
        return 0
    print("no position fix")
    return 1


def cmd_simulate(args) -> int:
    from gnsstpu.config import SignalConfig
    from gnsstpu.sim import IFSimulator, SatParams

    sig = _sig_config(args)
    rng = np.random.default_rng(args.seed)
    sats = []
    for spec in args.sat:
        prn, dopp, phase, cn0 = (spec.split(":") + ["45"])[:4]
        nav = rng.choice([-1.0, 1.0], 1500).astype(np.float32)
        sats.append(SatParams(prn=int(prn), doppler_hz=float(dopp),
                              code_phase_chips=float(phase),
                              cn0_dbhz=float(cn0), nav_bits=nav))
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=args.seed)
    with open(args.out, "wb") as f:
        for ms0 in range(0, args.ms, 256):
            n = min(256, args.ms - ms0)
            blk = sim.generate(n, ms0)
            q = np.clip(np.round(blk * args.scale), -127, 127
                        ).astype(np.int8)
            q.reshape(-1).tofile(f)
    print(f"wrote {args.ms} ms ({args.ms * sim.block_samples} samples) "
          f"to {args.out} (i8_iq)")
    return 0


def cmd_monitor(args) -> int:
    """Render the channel status board from a telemetry JSONL file
    (console display page, osgnss display.c / gse channel page).
    --interactive runs the curses ground station (runtime.station)."""
    import time as _time

    from gnsstpu.runtime.console import StatusBoard

    if getattr(args, "interactive", False):
        from gnsstpu.runtime.station import GroundStation, run_curses

        return run_curses(
            GroundStation(args.log, command_path=args.commands),
            interval=args.interval)

    board = StatusBoard()

    def show():
        return (board.render_all() if args.page == "all"
                else board.render(args.page))

    from gnsstpu.runtime.remote import parse_tcp_url
    tcp = parse_tcp_url(args.log)
    if tcp is not None:
        # Remote receiver: follow the live socket feed (one-shot
        # renders need a log file; the socket has no history).
        if not args.follow:
            raise SystemExit(
                "monitor tcp:// is a live feed — add --follow (or "
                "--interactive for the full station)")
        from gnsstpu.runtime.remote import StationSocket
        link = StationSocket(*tcp)
        try:
            while True:
                for line in link.read_lines():
                    try:
                        board.update(json.loads(line))
                    except json.JSONDecodeError:
                        pass
                print("\033[2J\033[H" + show(), flush=True)
                if link.closed:
                    print("-- receiver closed the link", flush=True)
                    return 0
                _time.sleep(args.interval)
        except KeyboardInterrupt:
            return 0

    if not args.follow:
        board.feed_jsonl(args.log)
        print(show())
        return 0
    pos = 0
    try:
        while True:
            with open(args.log) as f:
                f.seek(pos)
                for line in f:
                    if line.strip():
                        board.update(json.loads(line))
                pos = f.tell()
            print("\033[2J\033[H" + show(), flush=True)
            _time.sleep(args.interval)
    except KeyboardInterrupt:
        return 0


def cmd_analyze(args) -> int:
    """Render the offline analysis panel set from a telemetry log (the
    reference's matlab/*.m log-analysis scripts)."""
    import os

    from gnsstpu import viz

    os.makedirs(args.out, exist_ok=True)
    health_png = os.path.join(args.out, "health.png")
    viz.plot_health(args.log, health_png)
    print(f"wrote {health_png}")
    ekf_png = os.path.join(args.out, "ekf.png")
    if viz.plot_ekf_log(args.log, ekf_png):
        print(f"wrote {ekf_png}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gnsstpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("acquire", help="cold acquisition on an IF file")
    p.add_argument("file")
    _sig_args(p)
    _acq_args(p)
    p.set_defaults(fn=cmd_acquire)

    p = sub.add_parser("track", help="acquire + track with the manager")
    p.add_argument("file", nargs="?", default=None,
                   help="IF sample file (omit with --listen)")
    p.add_argument("--listen", default=None, metavar="tcp:PORT|udp:PORT",
                   help="ingest IF samples from a network front end "
                        "instead of a file (byte protocol: "
                        "docs/RADIO_FRONTEND.md); port 0 = OS-assigned, "
                        "printed at start")
    p.add_argument("--listen-fmt", default="i8_iq",
                   help="wire format of the listened stream: decoded "
                        "host formats i8_iq/i16_iq/c64/i8/gn3s_2bit, or "
                        "packed iq8/iq4/sm2/iq1 (shipped packed, "
                        "unpacked ON DEVICE — the production live path)")
    _sig_args(p)
    _acq_args(p)
    p.add_argument("--ms", type=int, default=5000)
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--epoch-ms", type=int, default=100)
    p.add_argument("--dll-bw", type=float, default=1.0)
    p.add_argument("--log", default=None, help="telemetry JSONL path")
    p.add_argument("--checkpoint", default=None,
                   help="save the live channel bank here after the run "
                        "(.npz; warm-restart with --resume)")
    p.add_argument("--resume", default=None,
                   help="warm-restart from a saved channel bank: resume "
                        "tracking with no re-acquisition (reference "
                        "skipAcquisition role)")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "fused", "gather", "table"],
                   help="tracking engine (auto = fused Pallas on TPU)")
    p.add_argument("--sync-every", type=int, default=1,
                   help="supervision epochs per device round-trip "
                        "(superepoch pipelining; >1 batches uploads/"
                        "dispatches/readbacks, decisions stale by <= N "
                        "epochs)")
    p.add_argument("--prefetch", action="store_true",
                   help="overlap chunk read/upload with device compute "
                        "and supervision (reader-thread pipeline; "
                        "requires --sync-every > 1)")
    p.add_argument("--readback", default="f32",
                   choices=["f32", "compact"],
                   help="device->host readback wire (compact = f16 "
                        "prompts + byte-packed single buffer, ~2x "
                        "less downlink)")
    p.add_argument("--use-iono", action="store_true",
                   help="apply the broadcast Klobuchar correction once "
                        "the iono page is decoded (reference decodes "
                        "but never applies it)")
    p.add_argument("--carrier-smoothing", type=float, default=0.0,
                   metavar="S",
                   help="Hatch carrier-smoothing window [s] (0 = off)")
    p.add_argument("--phase-rate", action="store_true",
                   help="EKF range-rate from integrated carrier-phase "
                        "deltas instead of windowed Doppler")
    p.add_argument("--assist", default=None,
                   help="assist-data JSON (almanac + iono/UTC): loaded "
                        "at start if present, saved after the run "
                        "(EEPROM warm-start role)")
    p.add_argument("--assist-seed", default=None,
                   help="X,Y,Z,T rough ECEF position [m] + GPS time "
                        "[s] enabling pre-fix warm-start visibility "
                        "with --assist")
    p.add_argument("--history-window-ms", type=int, default=None,
                   help="bound live per-PRN history + records to the "
                        "trailing window (constant-memory multi-hour "
                        "runs; choose >= the constellation's decode "
                        "span, e.g. 36000)")
    p.add_argument("--stream", nargs="?", const="fast", default=None,
                   choices=["fast", "realtime"],
                   help="feed via producer thread + native ring FIFO "
                        "(realtime = throttle to fs)")
    p.add_argument("--navigate", nargs="?", const="lsq", default=None,
                   choices=["lsq", "ekf"],
                   help="live ephemeris decode + PVT at epoch boundaries "
                        "(lsq = snapshot least squares; ekf = 8-state "
                        "PV+clock filter streamed as 'ekf' telemetry)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--commands", default=None,
                   help="JSONL command file polled each epoch "
                        "(drop/mask/unmask/set/stop)")
    p.add_argument("--station-port", type=int, default=None,
                   help="serve telemetry + accept station commands on "
                        "this TCP port (monitor remotely with "
                        "`gnsstpu monitor tcp://HOST:PORT "
                        "--interactive`); 0 = OS-assigned")
    p.add_argument("--mesh", default=None, metavar="AXIS=N[,AXIS=N]",
                   help="run the receiver sharded over a device mesh, "
                        "e.g. 'channel=4' (channels divide over chips; "
                        "production fused engine runs per-device via "
                        "shard_map)")
    p.set_defaults(fn=cmd_track)

    p = sub.add_parser("solve", help="full chain to a position fix")
    p.add_argument("file")
    _sig_args(p)
    _acq_args(p)
    p.add_argument("--ms", type=int, default=40000)
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--log", default=None,
                   help="write PVT solutions as telemetry JSONL")
    p.set_defaults(fn=cmd_solve)

    p = sub.add_parser("simulate", help="write a synthetic IF file")
    p.add_argument("out")
    _sig_args(p)
    p.add_argument("--sat", action="append", required=True,
                   metavar="PRN:DOPPLER:CODEPHASE[:CN0]")
    p.add_argument("--ms", type=int, default=2000)
    p.add_argument("--scale", type=float, default=24.0)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("monitor", help="status board from a telemetry log")
    p.add_argument("log",
                   help="telemetry JSONL path, or tcp://HOST:PORT of a "
                        "receiver started with --station-port "
                        "(interactive remote monitoring + commands)")
    p.add_argument("--follow", action="store_true")
    p.add_argument("--interval", type=float, default=1.0)
    p.add_argument("--page", default="channels",
                   choices=["channels", "pvt", "health", "events", "eph",
                            "alm", "all"],
                   help="console page (gse notebook tab equivalent)")
    p.add_argument("--interactive", action="store_true",
                   help="curses ground station (live pages, sparklines, "
                        "command entry; gse equivalent)")
    p.add_argument("--commands", default=None,
                   help="command file the live receiver polls "
                        "(interactive ':' commands append here)")
    p.set_defaults(fn=cmd_monitor)

    p = sub.add_parser("analyze",
                       help="render analysis panels from a telemetry log")
    p.add_argument("log")
    p.add_argument("--out", default="analysis")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("bench", help="run the repo benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
