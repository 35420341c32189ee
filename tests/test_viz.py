"""Smoke tests for the diagnostic plot layer (plot scripts are the
reference's de-facto assertions, SURVEY.md §4 — here they must at least
always render)."""

import os

import numpy as np

from gnsstpu import viz
from gnsstpu.acquisition.search import AcqResults
from gnsstpu.config import SignalConfig
from gnsstpu.nav.pvt import NavSolutions
from gnsstpu.runtime.sources import ArraySource
from gnsstpu.tracking.driver import TrackResults


def test_all_plots_render(tmp_path):
    rng = np.random.default_rng(0)
    sig = SignalConfig(if_freq=0.0, fs=2.048e6)
    src = ArraySource(rng.normal(0, 1, (40960, 2)).astype(np.float32))
    p1 = str(tmp_path / "probe.png")
    viz.probe_data(src, sig, p1, n_ms=10)

    acq = AcqResults(
        peak_metric=rng.uniform(1, 5, 32),
        code_phase=rng.integers(0, 2048, 32),
        carr_freq=rng.uniform(-4e3, 4e3, 32),
        detected=rng.uniform(0, 1, 32) > 0.7)
    p2 = str(tmp_path / "acq.png")
    viz.plot_acquisition(acq, p2, threshold=2.5)

    n = 500
    tr = TrackResults(
        prn=np.array([9]), status=np.array([True]),
        i_e=rng.normal(300, 30, (1, n)), q_e=rng.normal(0, 30, (1, n)),
        i_p=rng.normal(500, 30, (1, n)), q_p=rng.normal(0, 30, (1, n)),
        i_l=rng.normal(300, 30, (1, n)), q_l=rng.normal(0, 30, (1, n)),
        carr_freq=1500 + rng.normal(0, 1, (1, n)),
        code_freq=np.full((1, n), 1.023e6),
        abs_sample=np.cumsum(np.full((1, n), 2048.0), axis=1),
        dll_disc=rng.normal(0, 0.01, (1, n)),
        dll_disc_filt=rng.normal(0, 0.01, (1, n)),
        pll_disc=rng.normal(0, 0.01, (1, n)),
        pll_disc_filt=rng.normal(0, 0.01, (1, n)))
    p3 = str(tmp_path / "trk.png")
    viz.plot_tracking(tr, 0, p3)

    E = 20
    nav = NavSolutions(
        t_ms=np.arange(E) * 500.0, x=rng.normal(0, 1, E),
        y=rng.normal(0, 1, E), z=rng.normal(0, 1, E),
        dt=rng.normal(0, 1, E), latitude=np.full(E, 57.0),
        longitude=np.full(E, 10.0), height=50 + rng.normal(0, 2, E),
        utm_e=rng.normal(0, 3, E), utm_n=rng.normal(0, 3, E),
        utm_u=rng.normal(0, 3, E), dop=np.abs(rng.normal(2, 0.5, (E, 5))),
        n_sats=np.full(E, 6), valid=np.ones(E, bool))
    p4 = str(tmp_path / "nav.png")
    viz.plot_navigation(nav, p4)

    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 10000


def test_analysis_panels_render(tmp_path):
    """The matlab-analysis-set equivalents (pseudo/clock, EKF, run
    health) must render from framework objects and a telemetry log."""
    import json

    rng = np.random.default_rng(1)
    E = 20
    nav = NavSolutions(
        t_ms=np.arange(E) * 500.0, x=rng.normal(0, 1, E),
        y=rng.normal(0, 1, E), z=rng.normal(0, 1, E),
        dt=rng.normal(0, 1, E), latitude=np.full(E, 57.0),
        longitude=np.full(E, 10.0), height=50 + rng.normal(0, 2, E),
        utm_e=rng.normal(0, 3, E), utm_n=rng.normal(0, 3, E),
        utm_u=rng.normal(0, 3, E), dop=np.abs(rng.normal(2, 0.5, (E, 5))),
        n_sats=np.full(E, 6), valid=np.ones(E, bool),
        vx=rng.normal(0, 0.1, E), vy=rng.normal(0, 0.1, E),
        vz=rng.normal(0, 0.1, E), ddt=rng.normal(0, 0.01, E),
        vel_valid=np.ones(E, bool))
    p1 = str(tmp_path / "pseudo.png")
    viz.plot_pseudoranges(nav, p1)

    from gnsstpu.nav.ekf import EkfStep
    steps = [EkfStep(accepted=np.ones(6, bool),
                     innovations=rng.normal(0, 3, 6),
                     pos=np.array([1e6, 2e6, 3e6]) + i,
                     vel=rng.normal(0, 1, 3),
                     clock_bias_m=float(i), clock_drift_ms=0.1)
             for i in range(15)]
    p2 = str(tmp_path / "ekf.png")
    viz.plot_ekf(steps, p2)

    log = tmp_path / "tlm.jsonl"
    recs = []
    for e in range(5):
        recs.append({"type": "task_health", "epoch_ms": e * 100,
                     "stage": "track", "wall_s": 0.01})
        recs.append({"type": "task_health", "epoch_ms": e * 100,
                     "stage": "source", "wall_s": 0.0, "count": e,
                     "pushed": 10 * e, "popped": 9 * e, "overruns": 0})
        recs.append({"type": "channel_health", "epoch_ms": e * 100,
                     "chan": 0, "prn": 7, "state": "tracking",
                     "cn0_dbhz": 45.0 + e, "doppler_hz": 1200.0,
                     "pll_lock": 0.9})
    log.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    p3 = str(tmp_path / "health.png")
    viz.plot_health(str(log), p3)

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 10_000
