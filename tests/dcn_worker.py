"""Two-process DCN smoke worker (SURVEY §2.8 slot 5).

Launched twice by tests/test_dcn.py (process_id 0 and 1) on one
machine: each process contributes ONE local CPU device, the pair forms
a jax.distributed world over the loopback "DCN", and the time-sharded
long coherent acquisition (parallel.timeblock — ppermute halo + psum
combine) executes across the process boundary. The reference analogue
of a cross-process test is gps-sdr against gps-gse over named pipes
(objects/telemetry.cpp:80-89); this is the TPU framework's multi-host
equivalent: the same code path that spans pod hosts over DCN, executed
with gloo CPU collectives.

Usage: python tests/dcn_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))       # repo root (gnsstpu package)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()


def main() -> None:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gnsstpu.config import SignalConfig
    from gnsstpu.parallel.mesh import make_distributed_mesh
    from gnsstpu.parallel.timeblock import long_coherent_acquire
    from gnsstpu.sim import IFSimulator, SatParams

    mesh = make_distributed_mesh([("time", nproc)], coordinator=coord,
                                 num_processes=nproc, process_id=pid)
    # The world really spans processes: global devices > local devices.
    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1
    assert jax.process_count() == nproc

    sig = SignalConfig(if_freq=0.0, fs=1.023e6, complex_iq=True)
    sats = [SatParams(prn=7, doppler_hz=500.0, code_phase_chips=123.0,
                      cn0_dbhz=47.0)]
    sim = IFSimulator(sig, sats, noise_sigma=1.0, seed=4)
    k = 4
    spc = sig.samples_per_code
    samples = np.asarray(sim.generate(k + 2))[: k * spc + spc]
    cube = np.asarray(long_coherent_acquire(
        samples, sig, [5, 7], np.array([0.0, 500.0, 1000.0], np.float32),
        mesh, k_periods=k))
    pi, di, cp = np.unravel_index(int(np.argmax(cube)), cube.shape)
    # PRN 7 (row 1) at 500 Hz (bin 1) at ~123 chips (1 sample/chip).
    print(f"RESULT {pid} prn_row={pi} dopp_bin={di} cp={cp}", flush=True)
    assert (pi, di) == (1, 1), (pi, di, cp)
    assert abs(int(cp) - 123) <= 1, cp
    jax.distributed.shutdown()
    print(f"OK {pid}", flush=True)


if __name__ == "__main__":
    main()
