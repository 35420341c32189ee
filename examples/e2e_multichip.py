"""Multi-chip receiver demo: the SAME live ChannelManager, sharded.

The public `ChannelManager(mesh=...)` capability (SURVEY.md §2.8 DP
slot): a 2-axis device mesh is built, the slot bank + carried tracking
state shard over the "channel" axis, the sample chunk replicates, and
the identical pipelined receiver run (acquisition handoff, superepoch
scans, on-chunk reacquisition, supervision) executes GSPMD-partitioned
across every device — bit-exact against the single-device run on the
shard_map fused path (tests/test_parallel.py).

On a single-chip (or chipless) rig, make_mesh falls back to virtual
host-CPU devices: sharding-validation mode — the program partitioning
is real, the silicon is not. On a TPU pod slice the same script runs
unmodified over real chips.

Run: python examples/e2e_multichip.py [n_devices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import io

    from gnsstpu.config import (AcqConfig, ReceiverConfig, SignalConfig,
                                TrackConfig)
    from gnsstpu.parallel import make_mesh
    from gnsstpu.runtime.manager import ChannelManager
    from gnsstpu.runtime.sources import ArraySource
    from gnsstpu.runtime.telemetry import Telemetry
    from gnsstpu.sim import IFSimulator, SatParams

    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mesh = make_mesh([("channel", n_dev)])
    print(f"mesh: {mesh}")

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    prns = (2, 5, 9)
    sats = [SatParams(prn=p, doppler_hz=300.0 * (p - 5),
                      code_phase_chips=211.5 * p, cn0_dbhz=47.0)
            for p in prns]
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=13)
    samples = np.asarray(sim.generate(660))

    cfg = ReceiverConfig(
        signal=sig,
        acq=AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.4,
                      prn_list=prns, fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, el_spacing=0.3),
        n_channels=2 * n_dev)
    mgr = ChannelManager(
        ArraySource(samples), cfg,
        telemetry=Telemetry(sink=io.StringIO()), epoch_ms=100,
        reacq_period_ms=400, prn_pool=list(prns), sync_every=2,
        prefetch=True, mesh=mesh)

    t0 = time.perf_counter()
    recs = mgr.run(600)
    dt = time.perf_counter() - t0
    live = [int(p) for p in recs[-1].prn if p]
    sh = mgr._state.corr.sample_pos.sharding
    print(f"ran 600 ms over {n_dev} devices in {dt:.1f}s; "
          f"live PRNs: {sorted(live)}")
    print(f"state sharding: {sh}")
    assert sorted(live), "no channels tracking"
    assert getattr(sh, "mesh", None) is not None, "state not on the mesh"
    for rec in recs[-1:]:
        for prn, dopp, cn0 in zip(rec.prn, rec.doppler_hz, rec.cn0_dbhz):
            if prn:
                print(f"  PRN {prn:2d}: doppler {dopp:+8.1f} Hz  "
                      f"C/N0 {cn0:4.1f} dB-Hz")
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
