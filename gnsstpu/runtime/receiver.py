"""Full receiver pipeline: acquire -> track -> decode -> navigate.

The framework's equivalent of the reference's top-level run scripts
(GPS/L1/postProcessing.sce:60-144 for the offline flow; the realtime
receiver's thread graph main/init.cpp:289-434 collapses into this same
sequence because on a TPU the device does whole (channels x ms-blocks)
scans instead of per-ms thread handoffs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from gnsstpu.acquisition import acquire
from gnsstpu.acquisition.search import AcqResults
from gnsstpu.config import ReceiverConfig
from gnsstpu.nav import frame, lnav, pvt
from gnsstpu.nav.frame import FrameSync
from gnsstpu.nav.types import Ephemeris
from gnsstpu.signals.registry import get_signal
from gnsstpu.tracking import ChannelInit, TrackResults, track


@dataclasses.dataclass
class ReceiverOutput:
    acq: AcqResults
    channels: List[ChannelInit]
    track: Optional[TrackResults]
    syncs: List[FrameSync]
    ephs: Dict[int, Ephemeris]        # by PRN
    tows: Dict[int, float]            # TOW [s] at first subframe, by PRN
    nav: Optional[pvt.NavSolutions]


def allocate_channels(acq: AcqResults, n_channels: int) -> List[ChannelInit]:
    """Strongest-first channel allocation (preRun.sci:26-34 +
    simple_cold_allocate, osgnss_next_step.c:73-84)."""
    order = np.argsort(-acq.peak_metric)
    chans = []
    for i in order:
        if not acq.detected[i] or len(chans) >= n_channels:
            continue
        chans.append(ChannelInit(
            prn=int(i) + 1,
            code_phase=int(acq.code_phase[i]),
            doppler_hz=float(acq.carr_freq[i]) ))
    return chans


def run_receiver(source, cfg: ReceiverConfig,
                 n_ms: Optional[int] = None) -> ReceiverOutput:
    """Run the full chain on a sample source."""
    sig = cfg.signal
    n_ms = n_ms or cfg.ms_to_process
    sd = get_signal(sig.signal)

    from gnsstpu.acquisition.search import acq_samples_needed

    acq_res = acquire(source.read(0, acq_samples_needed(sig, cfg.acq)),
                      sig, cfg.acq)
    channels = allocate_channels(acq_res, cfg.n_channels)
    if not channels:
        return ReceiverOutput(acq_res, [], None, [], {}, {}, None)

    tr = track(source, channels, sig, cfg.track, n_ms)

    syncs: List[FrameSync] = []
    ephs: Dict[int, Ephemeris] = {}
    tows: Dict[int, float] = {}
    bit_len = sd.bit_len_codes
    for c, ch in enumerate(channels):
        sync = frame.find_preamble(tr.i_p[c], bit_len)
        syncs.append(sync)
        if not sync.found:
            continue
        bits = frame.bits_from(tr.i_p[c], sync, bit_len)
        eph, tow = lnav.decode_subframes(bits, d30_star=sync.d30_star)
        if eph.valid and tow is not None:
            ephs[ch.prn] = eph
            tows[ch.prn] = float(tow)

    nav = None
    good = [c for c, ch in enumerate(channels)
            if ch.prn in ephs and syncs[c].found]
    if len(good) >= 4:
        # All channels' TOWs must agree (GPS time is common).
        tow_set = {tows[channels[c].prn] for c in good}
        if len(tow_set) == 1:
            tow = tow_set.pop()
            nav = pvt.navigate(
                abs_sample=tr.abs_sample[good],
                prns=[channels[c].prn for c in good],
                subframe_start_ms=[syncs[c].first_subframe_ms
                                   for c in good],
                tow_s=tow,
                ephs=ephs,
                sig=sig,
                nav=cfg.nav,
                n_ms=n_ms,
                carr_freq=tr.carr_freq[good],
            )
    return ReceiverOutput(acq_res, channels, tr, syncs, ephs, tows, nav)
