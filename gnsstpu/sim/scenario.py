"""Geometry-consistent simulation scenarios.

Builds IFSimulator satellite parameters (delay, Doppler, Doppler rate, nav
bits) from broadcast ephemerides and a receiver position, so the simulated
stream is consistent end-to-end: acquisition -> tracking -> LNAV decode ->
pseudoranges -> least-squares must recover the configured receiver
position. This generalizes the reference's fixture-by-construction
simulator (GNSS_SOFTWARE_SIMULATORS/.../glonass_l3_generator.sce, which
fabricates Doppler/code-phase truth without orbit geometry) to full PVT
truth.

Timing model (see also pvt.navigate):
  - stream time s=0 corresponds to true receive time tow0 - lead_s;
  - each SV's subframe boundary (SV clock reading tow0) arrives at stream
    time lead_s + tau_i - clk_i (geometric delay minus SV clock offset);
  - delay evolution over the run is fit quadratically and realized through
    the simulator's coherent carrier-Doppler/code-rate model.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from gnsstpu.config import SPEED_OF_LIGHT, SignalConfig
from gnsstpu.nav import geodesy, lnav
from gnsstpu.nav.orbits import satpos
from gnsstpu.nav.types import Ephemeris
from gnsstpu.sim.generator import SatParams
from gnsstpu.signals.registry import get_signal


def signal_delay(eph: Ephemeris, recv_ecef: np.ndarray, t_receive: float,
                 satpos_fn=satpos) -> float:
    """Geometric signal delay tau [s] for reception at true time t_receive.

    Fixed-point in emission time with Sagnac frame rotation (the forward
    model of leastSquarePos.sci's e_r_corr iteration). satpos_fn selects
    the constellation propagator (default GPS Kepler).
    """
    tau = 0.075
    for _ in range(12):
        pos, _ = satpos_fn(t_receive - tau, [eph])
        rot = geodesy.e_r_corr(np.array([tau]), pos)[0]
        tau = float(np.linalg.norm(rot - recv_ecef) / SPEED_OF_LIGHT)
    return tau


def _fit_delay(eph, recv_ecef, t_r0, T, satpos_fn):
    """(tau0, taud, taudd): quadratic delay fit over the run."""
    tau0 = signal_delay(eph, recv_ecef, t_r0, satpos_fn)
    tau1 = signal_delay(eph, recv_ecef, t_r0 + T / 2, satpos_fn)
    tau2 = signal_delay(eph, recv_ecef, t_r0 + T, satpos_fn)
    taud = (4 * tau1 - 3 * tau0 - tau2) / T
    taudd = 2 * (tau2 - 2 * tau1 + tau0) / (T * T)
    return tau0, taud, taudd


def build_scenario(sig: SignalConfig, ephs: Dict[int, Ephemeris],
                   recv_ecef: np.ndarray, tow0_6s: int,
                   duration_s: float, lead_s: float = 2.0,
                   cn0_dbhz: float = 47.0,
                   n_subframes: int = 10) -> List[SatParams]:
    """SatParams for each PRN in ephs, geometry-consistent.

    tow0_6s: truncated TOW (6 s units) of the first encoded subframe.
    lead_s: filler-bit seconds before the first subframe (must cover the
    tracking pull-in transient; multiple of 0.02).
    """
    sd = get_signal(sig.signal)
    bit_s = sd.bit_len_codes * sig.code_period_s
    n_lead = int(round(lead_s / bit_s))
    if abs(n_lead * bit_s - lead_s) > 1e-9:
        raise ValueError("lead_s must be a whole number of bit periods")
    tow0 = tow0_6s * 6.0
    rng = np.random.default_rng(tow0_6s)
    sats = []
    T = duration_s
    for prn, eph in sorted(ephs.items()):
        _, clk = satpos(tow0, [eph])
        clk = float(clk[0])
        # Quadratic fit of the delay over the run: tau(s), s = stream time,
        # true receive time = tow0 - lead_s + s.
        t_r0 = tow0 - lead_s
        tau0 = signal_delay(eph, recv_ecef, t_r0)
        tau1 = signal_delay(eph, recv_ecef, t_r0 + T / 2)
        tau2 = signal_delay(eph, recv_ecef, t_r0 + T)
        taud = (4 * tau1 - 3 * tau0 - tau2) / T
        taudd = 2 * (tau2 - 2 * tau1 + tau0) / (T * T)

        f_carr = sd.carrier_freq(prn)
        filler = rng.choice([-1.0, 1.0], size=n_lead)
        filler[-2:] = 1.0
        bits = np.concatenate([
            filler,
            lnav.encode_frames(eph, tow0=tow0_6s, n_subframes=n_subframes)])
        sats.append(SatParams(
            prn=prn,
            doppler_hz=-f_carr * taud,
            doppler_rate=-f_carr * taudd,
            code_phase_chips=(tau0 - clk) * sig.code_freq,
            carrier_phase=float(rng.uniform(0, 2 * np.pi)),
            cn0_dbhz=cn0_dbhz,
            nav_bits=bits,
        ))
    return sats


# ---------------------------------------------------------------------------
# GLONASS FDMA scenario (PZ-90 state-vector ephemerides, string stream)
# ---------------------------------------------------------------------------

def signal_delay_gl(eph, recv_ecef: np.ndarray, t_receive: float) -> float:
    """Geometric delay [s] for a GLONASS SV (PZ-90 RK4 forward model with
    Sagnac rotation; the satposg.sci analogue of signal_delay)."""
    from gnsstpu.nav.glonass import satposg

    tau = 0.075
    for _ in range(12):
        pos, _, _ = satposg(t_receive - tau, [eph])
        rot = geodesy.e_r_corr(np.array([tau]), pos)[0]
        tau = float(np.linalg.norm(rot - recv_ecef) / SPEED_OF_LIGHT)
    return tau


def build_scenario_glonass(sig: SignalConfig, gephs: Dict[int, "object"],
                           recv_ecef: np.ndarray, t0_day_s: float,
                           duration_s: float, lead_strings: int = 1,
                           cn0_dbhz: float = 47.0, n_strings: int = 6,
                           seed: int = 77
                           ) -> Tuple[List[SatParams], Dict[int, "object"]]:
    """Geometry-consistent GLONASS FDMA SatParams + quantized ephemerides.

    gephs: {freq-channel prn: GlonassEphemeris} with state vectors at tb;
    tk fields are overwritten so string 1's data start is at satellite
    time-of-day t0_day_s (must be a multiple of 30 s, the tk grid).
    The stream carries `lead_strings` dummy strings (random data + the
    0.3 s time mark) before string 1, so the first time mark the receiver
    finds anchors string 1's data (find_time_mark -> +300 ms).

    Returns (sats, quantized_ephs): the scenario is generated FROM the
    quantized ephemerides, so the receiver-decoded ephemeris is bit-exact
    truth and the position-fix error isolates measurement noise.
    """
    import dataclasses as _dc

    from gnsstpu.nav import glonass as gl

    sd = get_signal(sig.signal)
    if abs(t0_day_s % 30.0) > 1e-9:
        raise ValueError("t0_day_s must be a multiple of 30 s (tk grid)")
    lead_s = 2.0 * lead_strings
    rng = np.random.default_rng(seed)
    qephs: Dict[int, gl.GlonassEphemeris] = {}
    sats: List[SatParams] = []
    T = duration_s
    t_r0 = t0_day_s - lead_s
    tk = int(round(t0_day_s))
    for prn, eph0 in sorted(gephs.items()):
        eph = gl.quantize_eph(_dc.replace(
            eph0, tk_h=tk // 3600, tk_m=(tk % 3600) // 60, tk_s=tk % 60))
        qephs[prn] = eph
        _, _, clk = gl.satposg(t0_day_s, [eph])
        clk = float(clk[0])
        tau0 = signal_delay_gl(eph, recv_ecef, t_r0)
        tau1 = signal_delay_gl(eph, recv_ecef, t_r0 + T / 2)
        tau2 = signal_delay_gl(eph, recv_ecef, t_r0 + T)
        taud = (4 * tau1 - 3 * tau0 - tau2) / T
        taudd = 2 * (tau2 - 2 * tau1 + tau0) / (T * T)

        f_carr = sd.carrier_freq(prn)
        lead = []
        for _ in range(lead_strings):
            d = rng.choice([-1.0, 1.0], size=170)
            lead.append(np.concatenate([d, gl.TIME_MARK_PM1]))
        sym = np.concatenate(lead + [gl.encode_strings(eph, n_strings)])
        sats.append(SatParams(
            prn=prn,
            doppler_hz=-f_carr * taud,
            doppler_rate=-f_carr * taudd,
            if_offset_hz=f_carr - sd.carrier_freq(sd.fdma_zero_prn),
            code_phase_chips=(tau0 - clk) * sig.code_freq,
            carrier_phase=float(rng.uniform(0, 2 * np.pi)),
            cn0_dbhz=cn0_dbhz,
            nav_bits=sym,
        ))
    return sats, qephs


# ---------------------------------------------------------------------------
# BeiDou D1 and Galileo I/NAV scenarios (Kepler-form ephemerides)
# ---------------------------------------------------------------------------

def build_scenario_beidou(sig: SignalConfig, ephs: Dict[int, "object"],
                          recv_ecef: np.ndarray, sow0: int,
                          duration_s: float, lead_s: float = 2.0,
                          cn0_dbhz: float = 47.0, n_subframes: int = 3,
                          seed: int = 41
                          ) -> Tuple[List[SatParams], Dict[int, "object"]]:
    """Geometry-consistent BeiDou B1I D1 SatParams + quantized ephs.

    sow0: BDT seconds-of-week of the first encoded subframe start. The
    symbol stream is lead_s of random 1 ms symbols, then subframes
    1..n_subframes (encode_symbols bakes bit x NH(20)). Ephemerides are
    quantized through the D1 codec so the decoded fields are truth.
    """
    from gnsstpu.nav import beidou as bd

    sd = get_signal(sig.signal)
    rng = np.random.default_rng(seed)
    n_lead = int(round(lead_s / sig.code_period_s))
    qephs = {}
    sats: List[SatParams] = []
    t_r0 = sow0 - lead_s
    for prn, eph0 in sorted(ephs.items()):
        q, _ = bd.decode_subframes(
            bd.encode_symbols(eph0, 0, n_subframes=3) * 800.0, 0, 3)
        qephs[prn] = q
        _, clk = bd.satpos_bd(float(sow0), [q])
        clk = float(clk[0])
        tau0, taud, taudd = _fit_delay(q, recv_ecef, t_r0, duration_s,
                                       bd.satpos_bd)
        f_carr = sd.carrier_freq(prn)
        sym = np.concatenate([
            rng.choice([-1.0, 1.0], size=n_lead),
            bd.encode_symbols(q, sow0, n_subframes=n_subframes)])
        sats.append(SatParams(
            prn=prn,
            doppler_hz=-f_carr * taud,
            doppler_rate=-f_carr * taudd,
            code_phase_chips=(tau0 - clk) * sig.code_freq,
            carrier_phase=float(rng.uniform(0, 2 * np.pi)),
            cn0_dbhz=cn0_dbhz,
            nav_bits=sym,
        ))
    return sats, qephs


def build_scenario_galileo(sig: SignalConfig, ephs: Dict[int, "object"],
                           recv_ecef: np.ndarray, tow0: int,
                           duration_s: float, lead_s: float = 2.0,
                           cn0_dbhz: float = 47.0, n_pages: int = 5,
                           seed: int = 59
                           ) -> Tuple[List[SatParams], Dict[int, "object"]]:
    """Geometry-consistent Galileo E1B I/NAV SatParams + quantized ephs.

    tow0: GST TOW of the first nominal page start. Symbols are 250 sps
    (one per 4 ms code period); lead_s of random symbols precede the
    pages (must be a multiple of the code period).
    """
    from gnsstpu.nav import galileo as gal

    sd = get_signal(sig.signal)
    rng = np.random.default_rng(seed)
    n_lead = int(round(lead_s / sig.code_period_s))
    if abs(n_lead * sig.code_period_s - lead_s) > 1e-9:
        raise ValueError("lead_s must be a whole number of code periods")
    qephs = {}
    sats: List[SatParams] = []
    t_r0 = tow0 - lead_s
    for prn, eph0 in sorted(ephs.items()):
        q, _ = gal.decode_frames(
            gal.encode_frames(eph0, tow0=0, n_pages=5) * 800.0, 0)
        q.SVID = prn
        qephs[prn] = q
        _, clk = gal.satpos_gal(float(tow0), [q])
        clk = float(clk[0])
        tau0, taud, taudd = _fit_delay(q, recv_ecef, t_r0, duration_s,
                                       gal.satpos_gal)
        f_carr = sd.carrier_freq(prn)
        sym = np.concatenate([
            rng.choice([-1.0, 1.0], size=n_lead),
            gal.encode_frames(q, tow0=tow0, n_pages=n_pages)])
        sats.append(SatParams(
            prn=prn,
            doppler_hz=-f_carr * taud,
            doppler_rate=-f_carr * taudd,
            code_phase_chips=(tau0 - clk) * sig.code_freq,
            carrier_phase=float(rng.uniform(0, 2 * np.pi)),
            cn0_dbhz=cn0_dbhz,
            nav_bits=sym,
        ))
    return sats, qephs


def make_glonass_constellation(recv_ecef: np.ndarray, tb: int, n: int = 5,
                               seed: int = 3) -> Dict[int, "object"]:
    """Synthetic GLONASS constellation with healthy geometry.

    State-vector ephemerides for n visible SVs on distinct frequency
    channels: satellites at GLONASS orbit radius along a chosen az/el
    spread (one near-zenith + a low-elevation ring, GDOP ~ 3-4 at n=6),
    near-circular ECEF velocity (Earth-rotation corrected). tb is the
    ephemeris reference time in minutes of the Moscow day
    (GLONASS ICD string 1; reference GLONASS/L1/include/ephemeris.sci).
    """
    from gnsstpu.nav import geodesy
    from gnsstpu.nav.glonass import GlonassEphemeris

    mu = 398600.44e9
    we = 0.7292115e-4
    r_orb = 25500e3
    recv_ecef = np.asarray(recv_ecef, np.float64)
    lat, lon, _ = geodesy.cart2geo(*recv_ecef, 5)
    phi, lam = np.radians(lat), np.radians(lon)
    e_hat = np.array([-np.sin(lam), np.cos(lam), 0.0])
    n_hat = np.array([-np.sin(phi) * np.cos(lam),
                      -np.sin(phi) * np.sin(lam), np.cos(phi)])
    u_hat = np.array([np.cos(phi) * np.cos(lam),
                      np.cos(phi) * np.sin(lam), np.sin(phi)])
    rays = [(0.0, 80.0), (60.0, 20.0), (130.0, 25.0), (190.0, 18.0),
            (250.0, 30.0), (315.0, 22.0), (100.0, 55.0)][:n]
    rng = np.random.default_rng(seed)
    gephs = {}
    for k, (az_d, el_d) in enumerate(rays):
        az, el = np.radians(az_d), np.radians(el_d)
        u = (np.cos(el) * (np.sin(az) * e_hat + np.cos(az) * n_hat)
             + np.sin(el) * u_hat)
        d = recv_ecef @ u
        s = -d + np.sqrt(d * d + r_orb ** 2 - recv_ecef @ recv_ecef)
        p = recv_ecef + s * u
        h = np.cross(p, rng.normal(size=3))
        h /= np.linalg.norm(h)
        v_i = np.sqrt(mu / r_orb) * h
        v = v_i - np.cross(np.array([0.0, 0.0, we]), p)
        prn = 5 + k                       # freq channels -2..+4 around 0
        gephs[prn] = GlonassEphemeris(
            tb=tb, x=p[0] / 1e3, y=p[1] / 1e3, z=p[2] / 1e3,
            xdot=v[0] / 1e3, ydot=v[1] / 1e3, zdot=v[2] / 1e3,
            taun=float(rng.uniform(-1e-4, 1e-4)),
            gamman=float(rng.uniform(-2e-12, 2e-12)),
            n=prn, valid=True)
    return gephs
