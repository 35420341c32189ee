"""Benchmark: 12-channel GPS L1 C/A tracking real-time factor per chip.

Headline metric vs the reference's real-time receiver, which sustains
12 channels at 1x real time on 2.048 Msps complex IF (dual-core x86 SSE2;
reference includes/config.h:42-44, includes/defines.h:150-151). We measure
how many seconds of 2.048 Msps IF signal the tracking engine processes per
wall-clock second with 12 live channels (vs_baseline = factor / 1.0).
BASELINE.json north star: >100x.

The engine under test is the fused Pallas tracking kernel (one resident
device program per chunk: NCO + carrier wipeoff + E/P/L correlation +
DLL/FLL-assisted-PLL updates for all channels). Samples are synthesized
on the host CPU; the chunk lives on device and loop-filter state carries
across repetitions, so steady-state device throughput is what's timed,
not host I/O.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gnsstpu.config import SignalConfig, TrackConfig
    from gnsstpu.ops import code_tables
    from gnsstpu.sim import IFSimulator, SatParams
    from gnsstpu.tracking import scan as tscan
    from gnsstpu.tracking.fused import make_fused_tracker

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    trk = TrackConfig(dll_bw=1.0)
    n_channels = 12
    chunk_ms = 1000

    prns = list(range(1, n_channels + 1))
    sats = [SatParams(prn=p, doppler_hz=300.0 * (p - 6),
                      code_phase_chips=77.0 * p, cn0_dbhz=47.0)
            for p in prns]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=2)
        samples = np.asarray(sim.generate(chunk_ms + 3))
    chunk = jnp.asarray(samples)

    spc = sig.samples_per_code
    ptab = code_tables.prompt_row_table(
        sig.signal, sig.fs, sig.code_freq, sig.code_length, spc + 2)
    codes = jnp.asarray(np.stack([ptab[p - 1] for p in prns]))
    spchip = sig.fs / sig.code_freq
    state = jax.tree.map(jnp.asarray, tscan.TrackState.init(
        np.array([int(round(s.code_phase_chips * spchip)) for s in sats]),
        np.array([s.doppler_hz + 30.0 for s in sats], np.float32)))
    cb, ia = tscan.channel_consts(sig, trk, prns)
    consts = (jnp.asarray(cb), jnp.asarray(ia))

    tracker = make_fused_tracker(sig, trk, n_blocks=chunk_ms)

    def step(st):
        # Rebase the chunk cursor so the resident chunk is reused; phase
        # state (NCOs, filters) carries across reps as in live tracking.
        st = st._replace(corr=st.corr._replace(
            sample_pos=jnp.minimum(st.corr.sample_pos
                                   - st.corr.sample_pos.min(), 2)))
        return tracker(chunk, codes, consts, st)

    # Warmup/compile.
    state, out = step(state)
    jax.block_until_ready(out)

    reps = 5
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, out = step(state)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)

    signal_s = chunk_ms / 1000.0
    factor = signal_s / best
    print(json.dumps({
        "metric": "gps_l1_12ch_tracking_realtime_factor",
        "value": round(factor, 2),
        "unit": "x_realtime_2.048Msps",
        "vs_baseline": round(factor / 1.0, 2),
    }))


if __name__ == "__main__":
    main()
