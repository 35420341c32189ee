"""Per-family tracking-engine adapters for the live ChannelManager.

The reference realtime receiver drives only GPS L1; its other
constellations live in separate offline Scilab receivers. This framework's
live runtime drives every family through ONE manager by putting the
family-specific pieces (state pytree, slot code tables, tracker call,
observable mapping) behind a small adapter:

  * ScanFamilyEngine — GPS/GLONASS FDMA/BeiDou 1 ms-code signals over the
    scan engine (tracking.scan) or the fused Pallas kernel
    (tracking.fused) — the original manager path.
  * BocEngine — Galileo E1B double-estimator (4 ms code periods,
    tracking.boc scan or fused Pallas BOC kernel).
  * DualEngine — GLONASS L3OC data+pilot (tracking.dual scan or fused
    dual kernel); exposes the data-component prompts for nav decode.

Every adapter returns per-block observables in the SAME EpochObs layout,
so lock supervision, telemetry, history and the superepoch pipeline in
runtime.manager are family-agnostic. One block = one code period
(period_ms: 1 for the 1 ms families, 4 for E1), and the manager's
epoch_ms must be a multiple of it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np

from gnsstpu.config import ReceiverConfig
from gnsstpu.signals.registry import get_signal


class EpochObs(NamedTuple):
    """Standardized per-block observables, [n_blocks, C] each.

    ip/qp: the prompt used for PLL/lock/nav decode (pilot prompt for
    dual-component signals). ie..ql: early/late taps for the code-lock
    indicator (the meandr-prompt taps for BOC). ip2/qp2: the
    data-component prompts (dual-component signals only, else None).
    """

    ip: jax.Array
    qp: jax.Array
    ie: jax.Array
    qe: jax.Array
    il: jax.Array
    ql: jax.Array
    rem: jax.Array
    blksize: jax.Array
    dopp: jax.Array
    ip2: Optional[jax.Array] = None
    qp2: Optional[jax.Array] = None


def make_engine(cfg: ReceiverConfig, mode: str = "auto", mesh=None,
                mesh_axis: str = "channel"):
    """Resolve (signal family, engine mode) -> adapter instance.

    mode: 'auto' (fused Pallas kernel on TPU, exact scan elsewhere),
    'fused', or the family's scan modes ('gather'/'table' where they
    exist).

    mesh: a jax Mesh — the engine becomes the MULTI-CHIP production
    path, channels sharded over mesh[mesh_axis] (SURVEY §2.8 DP slot).
    The fused Pallas kernel is wrapped per-device via shard_map
    (parallel.fused_shard); the XLA scan engines shard through GSPMD
    from the ChannelManager's input placements. The fused BOC/dual
    kernels have no shard_map wrapper yet, so those families resolve
    to their exact scan engines under a mesh.
    """
    from gnsstpu.tracking.driver import resolve_engine

    name = cfg.signal.signal
    if name == "galileo_e1b":
        fused = resolve_engine(mode) == "fused" and mesh is None
        return BocEngine(cfg, fused=fused)
    if name == "glonass_l3oc":
        fused = resolve_engine(mode) == "fused" and mesh is None
        return DualEngine(cfg, fused=fused)
    return ScanFamilyEngine(cfg, mode, mesh=mesh, mesh_axis=mesh_axis)


class _Base:
    has_data_component = False

    def __init__(self, cfg: ReceiverConfig):
        self.cfg = cfg
        self.sig = cfg.signal
        self.sd = get_signal(self.sig.signal)
        self.period_ms = int(round(self.sig.code_period_s * 1e3))
        self.spc = self.sig.samples_per_code
        #: multiply rem (chips of the pseudorange code) by this to get
        #: samples (abs_sample bookkeeping).
        self.rem_to_samples = self.sig.fs / self.sig.code_freq

    def _interp(self, interpret):
        if interpret is None:
            return jax.default_backend() != "tpu"
        return interpret


class ScanFamilyEngine(_Base):
    """1 ms-code families (GPS L1, GLONASS L1/L2 FDMA, BeiDou B1) over
    tracking.scan ('gather'/'table') or the fused kernel ('fused')."""

    slot_keys = ("codes", "carr_base", "inv_aid")

    def __init__(self, cfg: ReceiverConfig, mode: str = "auto",
                 mesh=None, mesh_axis: str = "channel"):
        super().__init__(cfg)
        from gnsstpu.tracking.driver import resolve_engine

        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.name = resolve_engine(mode)
        if self.name == "fused":
            from gnsstpu.tracking.fused import fused_code_table
            self._tab = fused_code_table(self.sig, cfg.track)
        elif self.name == "table":
            from gnsstpu.ops import code_tables
            self._tab = code_tables.phase_row_table(
                self.sig.signal, self.sig.fs, self.sig.code_freq,
                self.sig.code_length, self.spc + 2)
        else:
            from gnsstpu.ops import code_tables
            self._tab = code_tables.padded_code_table(self.sig.signal)

    def new_bank(self, C: int) -> dict:
        from gnsstpu.tracking import scan as tscan

        cb, ia = tscan.channel_consts(self.sig, self.cfg.track, [1] * C)
        return {"codes": np.zeros((C,) + self._tab.shape[1:], np.float32),
                "carr_base": cb, "inv_aid": ia}

    def write_slot(self, bank: dict, idx: int, prn: int) -> None:
        from gnsstpu.tracking import scan as tscan

        bank["codes"][idx] = self._tab[prn - 1]
        off = 0.0
        if self.sd.fdma_zero_prn is not None:
            off = (self.sd.carrier_freq(prn)
                   - self.sd.carrier_freq(self.sd.fdma_zero_prn))
        cb1, ia1 = tscan.channel_consts(
            self.sig, self.cfg.track, [prn], if_offsets_hz=[off])
        bank["carr_base"][idx] = cb1[0]
        bank["inv_aid"][idx] = ia1[0]

    def init_state(self, C: int):
        from gnsstpu.tracking import scan as tscan

        return tscan.TrackState.init(
            np.zeros(C, np.int64), np.zeros(C, np.float32),
            aid_div=self.cfg.track.aid_div)

    def slot_state(self, doppler_hz: float):
        from gnsstpu.tracking import scan as tscan

        return tscan.TrackState.init(
            np.zeros(1, np.int64),
            np.array([doppler_hz], np.float32),
            aid_div=self.cfg.track.aid_div)

    def make_step(self, n_blocks: int, interpret=None):
        if self.name == "fused" and self.mesh is not None:
            # Multi-chip production path: the SAME pallas_call on every
            # device of mesh[axis], channels sharded, chunk replicated,
            # zero steady-state collectives (parallel.fused_shard).
            from gnsstpu.parallel.fused_shard import (
                make_sharded_fused_tracker)
            if interpret is None:
                # Kernel mode follows the MESH's devices (a virtual CPU
                # validation mesh needs the interpreter even when the
                # default backend is a real TPU).
                interpret = self.mesh.devices.flat[0].platform != "tpu"
            tracker = make_sharded_fused_tracker(
                self.sig, self.cfg.track, mesh=self.mesh,
                n_blocks=n_blocks, axis=self.mesh_axis,
                interpret=interpret)
        elif self.name == "fused":
            from gnsstpu.tracking.fused import make_fused_tracker
            tracker = make_fused_tracker(
                self.sig, self.cfg.track, n_blocks=n_blocks,
                interpret=self._interp(interpret))
        else:
            from gnsstpu.tracking import scan as tscan
            tracker = tscan.make_tracker(
                self.sig, self.cfg.track, n_blocks=n_blocks,
                code_mode=self.name)

        def step(win, bank, state):
            state, out = tracker(
                win, bank["codes"], (bank["carr_base"], bank["inv_aid"]),
                state)
            obs = EpochObs(
                ip=out.ip, qp=out.qp, ie=out.ie, qe=out.qe,
                il=out.il, ql=out.ql, rem=out.rem_code_phase,
                blksize=out.blksize, dopp=out.carr_doppler)
            return state, obs

        return step


class BocEngine(_Base):
    """Galileo E1B double-estimator (4 ms blocks).

    The pseudorange observable is the primary-code estimator, so rem is
    in primary chips (rem_to_samples = fs / 1.023 MHz)."""

    slot_keys = ("codes", "carr_base")

    def __init__(self, cfg: ReceiverConfig, fused: bool):
        super().__init__(cfg)
        from gnsstpu.signals import galileo_e1

        self.name = "boc_fused" if fused else "boc"
        self.fused = fused
        # sig registry convention: code_freq/code_length at the meandr
        # rate; the primary code is half that (tracking.boc).
        self.rem_to_samples = self.sig.fs / (self.sig.code_freq / 2.0)
        if fused:
            from gnsstpu.tracking.boc import boc_fused_tables
            ctab, stab, _, _ = boc_fused_tables(
                self.sig, cfg.track, list(range(1, self.sd.num_prn + 1)))
            self._tab, self._sub = ctab, stab
        else:
            def pad(c):
                return np.concatenate([c[-1:], c, c[:1]]).astype(
                    np.float32)
            self._tab = np.stack(
                [pad(galileo_e1.primary_code(p))
                 for p in range(1, self.sd.num_prn + 1)])
            self._sub = pad(galileo_e1.subcarrier())

    def new_bank(self, C: int) -> dict:
        from gnsstpu.ops import nco

        cb = np.full(C, nco.freq_to_step_u32(self.sig.if_freq,
                                             self.sig.fs), np.uint32)
        return {"codes": np.zeros((C,) + self._tab.shape[1:], np.float32),
                "sub": np.asarray(self._sub, np.float32),
                "carr_base": cb}

    def write_slot(self, bank: dict, idx: int, prn: int) -> None:
        bank["codes"][idx] = self._tab[prn - 1]

    def init_state(self, C: int):
        from gnsstpu.tracking.boc import BocTrackState

        return BocTrackState.init(np.zeros(C, np.int64),
                                  np.zeros(C, np.float32),
                                  aid_code=self.cfg.track.aid_div,
                                  aid_sub=self.cfg.track.aid_div / 2.0)

    def slot_state(self, doppler_hz: float):
        from gnsstpu.tracking.boc import BocTrackState

        return BocTrackState.init(np.zeros(1, np.int64),
                                  np.array([doppler_hz], np.float32),
                                  aid_code=self.cfg.track.aid_div,
                                  aid_sub=self.cfg.track.aid_div / 2.0)

    def make_step(self, n_blocks: int, interpret=None):
        if self.fused:
            from gnsstpu.tracking.boc import make_fused_boc_tracker
            tracker = make_fused_boc_tracker(
                self.sig, self.cfg.track, n_blocks=n_blocks,
                interpret=self._interp(interpret))
        else:
            from gnsstpu.tracking.boc import make_boc_tracker
            tracker = make_boc_tracker(self.sig, self.cfg.track,
                                       n_blocks=n_blocks)

        def step(win, bank, state):
            state, out = tracker(win, bank["codes"], bank["sub"],
                                 bank["carr_base"], state)
            a = out.acc
            obs = EpochObs(
                ip=a.i_pp, qp=a.q_pp, ie=a.i_pe, qe=a.q_pe,
                il=a.i_pl, ql=a.q_pl, rem=a.rem_code_phase,
                blksize=a.blksize, dopp=out.carr_doppler)
            return state, obs

        return step


class DualEngine(_Base):
    """GLONASS L3OC data+pilot (1 ms blocks, 12 accumulators).

    Lock/PLL observables ride the pilot; ip2/qp2 carry the data prompts
    for overlay sync + demodulation (nav.glonass_l3)."""

    slot_keys = ("pilot", "data", "tab", "carr_base")
    has_data_component = True

    def __init__(self, cfg: ReceiverConfig, fused: bool):
        super().__init__(cfg)
        self.name = "dual_fused" if fused else "dual"
        self.fused = fused
        self.n_sats = 31          # satellite numbers 1..31 (pilot+data)

    def _codes(self, prn):
        from gnsstpu.signals import glonass_l3 as l3

        def pad(c):
            return np.concatenate([c[-1:], c, c[:1]]).astype(np.float32)
        return (pad(l3.generate_l3_code(l3.pilot_prn(prn))),
                pad(l3.generate_l3_code(l3.data_prn(prn))))

    def new_bank(self, C: int) -> dict:
        from gnsstpu.ops import nco

        cb = np.full(C, nco.freq_to_step_u32(self.sig.if_freq,
                                             self.sig.fs), np.uint32)
        bank = {"carr_base": cb}
        if self.fused:
            from gnsstpu.tracking.dual import dual_fused_table
            shape = dual_fused_table(self.sig, self.cfg.track, [1]).shape
            bank["tab"] = np.zeros((C,) + shape[1:], np.float32)
        else:
            L = self.sig.code_length + 2
            bank["pilot"] = np.zeros((C, L), np.float32)
            bank["data"] = np.zeros((C, L), np.float32)
        return bank

    def write_slot(self, bank: dict, idx: int, prn: int) -> None:
        if self.fused:
            from gnsstpu.tracking.dual import dual_fused_table
            bank["tab"][idx] = dual_fused_table(
                self.sig, self.cfg.track, [prn])[0]
        else:
            p, d = self._codes(prn)
            bank["pilot"][idx] = p
            bank["data"][idx] = d

    def init_state(self, C: int):
        from gnsstpu.tracking.scan import TrackState

        return TrackState.init(np.zeros(C, np.int64),
                               np.zeros(C, np.float32),
                               aid_div=self.cfg.track.aid_div)

    def slot_state(self, doppler_hz: float):
        from gnsstpu.tracking.scan import TrackState

        return TrackState.init(np.zeros(1, np.int64),
                               np.array([doppler_hz], np.float32),
                               aid_div=self.cfg.track.aid_div)

    def make_step(self, n_blocks: int, interpret=None):
        if self.fused:
            from gnsstpu.tracking.dual import make_fused_dual_tracker
            ftr = make_fused_dual_tracker(
                self.sig, self.cfg.track, n_blocks=n_blocks,
                interpret=self._interp(interpret))

            def tracker(win, bank, state):
                return ftr(win, bank["tab"], bank["carr_base"], state)
        else:
            from gnsstpu.tracking.dual import make_dual_tracker
            dtr = make_dual_tracker(self.sig, self.cfg.track,
                                    n_blocks=n_blocks)

            def tracker(win, bank, state):
                return dtr(win, bank["pilot"], bank["data"],
                           bank["carr_base"], state)

        def step(win, bank, state):
            state, out = tracker(win, bank, state)
            a = out.acc
            obs = EpochObs(
                ip=a.ip, qp=a.qp, ie=a.ie, qe=a.qe, il=a.il, ql=a.ql,
                rem=a.rem_code_phase, blksize=a.blksize,
                dopp=out.carr_doppler, ip2=a.ip2, qp2=a.qp2)
            return state, obs

        return step
