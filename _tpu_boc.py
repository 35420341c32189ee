import time
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, 'tests')
from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.sim import IFSimulator, SatParams
from gnsstpu.ops import nco
from gnsstpu.tracking.boc import (BocTrackState, boc_fused_tables,
                                  make_fused_boc_tracker)

SIG = SignalConfig(signal="galileo_e1b", if_freq=0.0, fs=4.2e6,
                   code_freq=2.046e6, code_length=8184, complex_iq=True)
prn, n_blocks = 11, 150
rng = np.random.default_rng(9)
sat = SatParams(prn=prn, doppler_hz=1234.0, code_phase_chips=3210.5,
                cn0_dbhz=48.0,
                nav_bits=rng.choice([-1.0, 1.0], 400).astype(np.float64))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    sim = IFSimulator(SIG, [sat], noise_sigma=1.0, seed=4)
    samples = np.asarray(sim.generate(n_blocks + 3))
chunk = jnp.asarray(samples)
spchip = SIG.fs / SIG.code_freq
cp0 = int(round((sat.code_phase_chips * spchip) % SIG.samples_per_code))
trk = TrackConfig(dll_bw=1.0, el_spacing=0.25, pll_bw=15.0, fll_bw=50.0,
                  sll_bw=0.5, sll_spacing=0.25, aid_div=1540.0)
state0 = jax.tree.map(jnp.asarray, BocTrackState.init(
    np.array([cp0]), np.array([sat.doppler_hz + 10.0], np.float32)))
cb = jnp.asarray(np.array([nco.freq_to_step_u32(SIG.if_freq, SIG.fs)], np.uint32))
ctab, stab, _, _ = boc_fused_tables(SIG, trk, [prn])
ctab, stab = jnp.asarray(ctab), jnp.asarray(stab)
print("ctab", ctab.shape, round(ctab.nbytes/1e6,1), "MB; stab", stab.shape, flush=True)
t0 = time.time()
fused = make_fused_boc_tracker(SIG, trk, n_blocks=n_blocks)
gs, go = fused(chunk, ctab, stab, cb, state0)
_ = float(np.asarray(go.acc.i_pp)[-1, -1])
print("compile+run:", round(time.time()-t0, 1), "s", flush=True)
d = np.asarray(go.carr_doppler)[:, 0]
print("dopp tail:", np.round(d[-5:], 2), flush=True)
ip = np.asarray(go.acc.i_pp)[:, 0]
print("|ipp| tail mean:", round(float(np.abs(ip[-30:]).mean()), 1))
