"""Mixed-constellation joint PVT: GPS + GLONASS in ONE solve.

VERDICT r2 item 10: the reference ecosystem ships four separate
single-constellation receivers (GPS/L1 + GLONASS/L1 postNavigation.sci
et al.); this framework solves position + per-system clock biases from
the UNION of pseudoranges (pvt.navigate_joint), so 3 GPS + 3 GLONASS
satellites produce a fix neither subset alone can (each is under the
4-satellite single-system minimum).
"""

import numpy as np
import pytest

from gnsstpu.config import (AcqConfig, NavConfig, ReceiverConfig,
                            SignalConfig, TrackConfig)
from gnsstpu.nav import pvt
from gnsstpu.runtime.receiver import run_receiver
from gnsstpu.runtime.sources import SimSource
from gnsstpu.sim import IFSimulator

RECV = np.array([3427947.0, 603774.0, 5326967.0])
N_MS = 24000
FS = 4.096e6


def _system_obs(out, sig, satpos_fn):
    """SystemObs from a ReceiverOutput (navigate_from_anchors alignment:
    every channel advanced to the latest anchor time)."""
    good = [c for c, ch in enumerate(out.channels)
            if ch.prn in out.ephs and out.anchors[c].found]
    period = sig.code_period_s
    t0 = max(out.anchors[c].t_anchor for c in good)
    sf = [out.anchors[c].anchor_idx
          + int(round((t0 - out.anchors[c].t_anchor) / period))
          for c in good]
    return pvt.SystemObs(
        prns=[out.channels[c].prn for c in good],
        abs_sample=out.track.abs_sample[good],
        subframe_start=sf, tow_s=t0, ephs=out.ephs,
        satpos_fn=satpos_fn, code_period_s=period, fs=sig.fs)


@pytest.fixture(scope="module")
def dual_constellation_outputs():
    """Two 3-SV runs (GPS, GLONASS FDMA) against the SAME receiver
    position on the SAME nominal sample clock."""
    from gnsstpu.sim.scenario import build_scenario, build_scenario_glonass
    from tests.test_full_chain import TOW0_6S, visible_ephs
    from tests.test_glonass import GFIX_T0, make_glonass_constellation

    sig_g = SignalConfig(if_freq=0.0, fs=FS, complex_iq=True)
    ephs_g = dict(list(visible_ephs(6).items())[:3])
    sats_g = build_scenario(sig_g, ephs_g, RECV, TOW0_6S,
                            duration_s=N_MS / 1000.0, cn0_dbhz=47.0)
    sim_g = IFSimulator(sig_g, sats_g, noise_sigma=1.0, seed=21)
    cfg_g = ReceiverConfig(
        signal=sig_g,
        acq=AcqConfig(doppler_band=10e3, coherent_ms=2, threshold=2.4,
                      prn_list=tuple(ephs_g), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=3)
    out_g = run_receiver(SimSource(sim_g, N_MS + 50), cfg_g, n_ms=N_MS)

    sig_r = SignalConfig(signal="glonass_l1of", if_freq=0.0, fs=FS,
                         code_freq=0.511e6, code_length=511,
                         fdma_step=562.5e3, complex_iq=True)
    gephs = make_glonass_constellation(RECV, n=3)
    sats_r, qephs = build_scenario_glonass(
        sig_r, gephs, RECV, GFIX_T0, duration_s=N_MS / 1000.0,
        cn0_dbhz=48.0, n_strings=8)
    sim_r = IFSimulator(sig_r, sats_r, noise_sigma=1.0, seed=31)
    cfg_r = ReceiverConfig(
        signal=sig_r,
        acq=AcqConfig(doppler_band=14e3, coherent_ms=2, threshold=2.5,
                      prn_list=tuple(qephs), fine_doppler_ms=10),
        track=TrackConfig(dll_bw=1.0, pll_bw=25.0, fll_bw=250.0,
                          aid_div=1602e6 / 0.511e6),
        nav=NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                      use_tropo=False),
        n_channels=3)
    out_r = run_receiver(SimSource(sim_r, N_MS + 60), cfg_r, n_ms=N_MS)
    return sig_g, out_g, sig_r, out_r


def test_single_constellation_subsets_cannot_fix(
        dual_constellation_outputs):
    """3 satellites per system: below the single-system minimum, so each
    receiver decodes ephemerides but produces NO navigation solution."""
    _, out_g, _, out_r = dual_constellation_outputs
    assert len(out_g.ephs) == 3 and out_g.nav is None
    assert len(out_r.ephs) == 3 and out_r.nav is None


def test_joint_gps_glonass_fix(dual_constellation_outputs):
    """The joint solver fuses 3 GPS + 3 GLONASS pseudoranges with an
    inter-system clock state and produces a position fix."""
    from gnsstpu.nav import glonass as gl
    from gnsstpu.nav.orbits import satpos

    sig_g, out_g, sig_r, out_r = dual_constellation_outputs
    sys_g = _system_obs(out_g, sig_g, satpos)
    sys_r = _system_obs(out_r, sig_r, gl.satpos_gl)
    nav = NavConfig(sol_period_ms=500, elevation_mask_deg=10.0,
                    use_tropo=False)
    n_epochs = 10
    sol = pvt.navigate_joint([sys_g, sys_r], nav, n_epochs)

    assert sol.valid.sum() >= 8, f"only {int(sol.valid.sum())} epochs"
    err = np.linalg.norm(np.stack(
        [sol.x[sol.valid] - RECV[0], sol.y[sol.valid] - RECV[1],
         sol.z[sol.valid] - RECV[2]]), axis=0)
    assert np.mean(err) < 30.0, f"mean 3D error {np.mean(err):.1f} m"
    assert np.max(err) < 100.0
    # The estimated GPS-GLONASS time offset is an (arbitrary but)
    # CONSTANT bias: stable to meters across epochs.
    inter = sol.inter_sys[sol.valid, 0]
    assert np.std(inter) < 15.0, f"inter-system bias unstable: {inter}"
    # All six satellites contribute.
    assert np.all(sol.n_sats[sol.valid] == 6)
