"""Online navigator: continuous PVT from live tracking (PVT-thread role).

The reference's real-time receiver navigates continuously — channels
stream bits to the Ephemeris thread and the PVT thread solves at a fixed
cadence (objects/ephemeris.cpp:160-603, objects/pvt.cpp:268 Navigate,
wired by pipes, main/init.cpp). The framework's offline pipeline
(runtime.receiver) decodes and solves after the run; this module is the
LIVE counterpart: polled by the ChannelManager at epoch boundaries, it

  1. watches each tracked PRN's accumulating prompt history, attempts the
     constellation's frame sync + ephemeris decode once enough bits
     exist (retrying on a backoff cadence),
  2. once >= 4 channels have ephemerides + anchors, aligns them to a
     common transmit epoch and runs the LSQ epoch navigator over the
     window tracked so far, emitting each NEW solution as a PVT
     telemetry record (SPS message family, reference messages.h).

Constellations: GPS LNAV, GLONASS strings, BeiDou D1 (the 1 ms-code
families the ChannelManager drives; Galileo's BOC path has its own
4 ms-cadence tracker outside the manager).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np

from gnsstpu.config import NavConfig, SignalConfig
from gnsstpu.nav import frame, lnav, pvt


def _decode_gps(ip: np.ndarray, bit_len: int):
    sync = frame.find_preamble(ip, bit_len)
    if not sync.found:
        return None
    bits = frame.bits_from(ip, sync, bit_len)
    eph, tow = lnav.decode_subframes(bits, d30_star=sync.d30_star)
    if not (eph.valid and tow is not None):
        return None
    return sync.first_subframe_ms, float(tow), eph


def _decode_glonass(ip: np.ndarray, bit_len: int):
    from gnsstpu.nav import glonass as gl

    tm = gl.find_time_mark(ip)
    if tm < 0:
        return None
    eph, t = gl.decode_strings(ip, tm + 300)
    if not (eph.valid and t is not None):
        return None
    return tm, float(t), eph


def _decode_beidou(ip: np.ndarray, bit_len: int):
    from gnsstpu.nav import beidou as bd

    start, _pol = bd.find_subframe(ip)
    if start < 0:
        return None
    eph, t = bd.decode_subframes(ip, start)
    if not (eph.valid and t is not None):
        return None
    return start, float(t), eph


def _family(signal: str):
    """(decoder, (satpos_fn, satvel_fn), min_ms before first attempt)."""
    if signal == "gps_l1ca":
        from gnsstpu.nav.ekf import satpos_vel
        from gnsstpu.nav.orbits import satpos
        return _decode_gps, (satpos, satpos_vel), 7000
    if signal in ("glonass_l1of", "glonass_l2of"):
        from gnsstpu.nav import glonass as gl
        return _decode_glonass, (gl.satpos_gl, gl.satpos_vel_gl), 4000
    if signal == "beidou_b1i":
        from gnsstpu.nav import beidou as bd
        return _decode_beidou, (bd.satpos_bd, bd.satpos_vel_bd), 7000
    return None, (None, None), 0


class OnlineNavigator:
    """Poll-driven live decode + PVT over the ChannelManager's history.

    Attach via ChannelManager(..., navigator=OnlineNavigator(sig, nav)).
    Solutions stream to the manager's telemetry as `pvt` records and
    accumulate in self.solutions ([(epoch_t_ms, NavSolutions-row dict)]).
    """

    def __init__(self, sig: SignalConfig, nav: NavConfig,
                 retry_ms: int = 2000):
        self.sig = sig
        self.nav = nav
        self.retry_ms = retry_ms
        self._decode, self._fns, self._min_ms = _family(sig.signal)
        self.decoded: Dict[int, Tuple[int, float, object]] = {}
        self._next_try: Dict[int, int] = {}
        self._next_nav = 0
        self._emitted_t = set()
        self.solutions = []

    # -- called by the manager at epoch boundaries --

    def poll(self, mgr, epoch_ms: int) -> None:
        if self._decode is None:
            return
        self._try_decodes(mgr, epoch_ms)
        self._navigate(mgr, epoch_ms)

    def _stream(self, mgr, prn: int):
        h = mgr.history[prn]
        ip = np.concatenate(h["i_p"]) if h["i_p"] else np.zeros(0)
        return h, ip

    def _try_decodes(self, mgr, epoch_ms: int) -> None:
        bit_len = mgr.sd.bit_len_codes
        for s in mgr.slots:
            prn = s.prn
            if not prn or prn in self.decoded:
                continue
            if epoch_ms < self._next_try.get(prn, self._min_ms):
                continue
            self._next_try[prn] = epoch_ms + self.retry_ms
            _, ip = self._stream(mgr, prn)
            if len(ip) < self._min_ms:
                continue
            got = self._decode(ip, bit_len)
            if got is None:
                continue
            self.decoded[prn] = got
            mgr.tlm.event(epoch_ms, "ephemeris_decoded", prn=prn,
                          anchor_idx=int(got[0]), t_anchor=got[1])

    def _navigate(self, mgr, epoch_ms: int) -> None:
        if epoch_ms < self._next_nav:
            return
        self._next_nav = epoch_ms + self.nav.sol_period_ms
        live = {s.prn for s in mgr.slots if s.prn}
        good = [p for p in sorted(self.decoded) if p in live]
        if len(good) < 4:
            return
        streams = {p: self._stream(mgr, p) for p in good}
        # Channels acquired at different epochs have offset stream
        # origins; align every stream to the latest channel start so
        # record index k means the same receive epoch on all rows.
        start = {p: streams[p][0]["start_ms"] for p in good}
        common = max(start.values())
        off = {p: common - start[p] for p in good}
        n_ms = min(sum(len(a) for a in streams[p][0]["abs_sample"])
                   - off[p] for p in good)
        if n_ms <= 0:
            return
        period = self.sig.code_period_s
        # Per channel: transmit time of the code start at ALIGNED index 0
        # (t_anchor refers to own-stream index anchor = aligned index
        # anchor - off). The common epoch t0 = latest of these puts every
        # anchor index sf >= 0 (navigate_from_anchors alignment, live).
        t00 = {p: self.decoded[p][1]
               - (self.decoded[p][0] - off[p]) * period for p in good}
        t0 = max(t00.values())
        sf = [int(round((t0 - t00[p]) / period)) for p in good]
        if max(sf) >= n_ms:
            return
        abs_sample = np.zeros((len(good), n_ms))
        for i, p in enumerate(good):
            h, _ = streams[p]
            abs_sample[i] = np.concatenate(
                h["abs_sample"])[off[p]: off[p] + n_ms]
        ephs = {p: self.decoded[p][2] for p in good}
        sol = pvt.navigate(
            abs_sample=abs_sample, prns=good, subframe_start_ms=sf,
            tow_s=t0, ephs=ephs, sig=self.sig, nav=self.nav, n_ms=n_ms,
            satpos_fn=self._fns[0], satvel_fn=self._fns[1])
        for k in range(len(sol.t_ms)):
            if not sol.valid[k] or sol.t_ms[k] in self._emitted_t:
                continue
            self._emitted_t.add(sol.t_ms[k])
            mgr.tlm.pvt(int(sol.t_ms[k]), float(sol.latitude[k]),
                        float(sol.longitude[k]), float(sol.height[k]),
                        int(sol.n_sats[k]),
                        gdop=round(float(sol.dop[k, 0]), 2),
                        hdop=round(float(sol.dop[k, 2]), 2),
                        x=round(float(sol.x[k]), 2),
                        y=round(float(sol.y[k]), 2),
                        z=round(float(sol.z[k]), 2))
            self.solutions.append({
                "t_ms": float(sol.t_ms[k]), "x": float(sol.x[k]),
                "y": float(sol.y[k]), "z": float(sol.z[k]),
                "lat": float(sol.latitude[k]),
                "lon": float(sol.longitude[k]),
                "h": float(sol.height[k]), "n_sv": int(sol.n_sats[k])})
