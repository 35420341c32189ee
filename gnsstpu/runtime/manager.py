"""Channel manager: acquisition scheduling, lock supervision, re-acquisition.

The runtime orchestration layer — the framework's equivalent of the
reference's SV_Select + Channel life-cycle machinery:
  * free-channel scan and acquisition requests
    (objects/sv_select.cpp:189-263),
  * lock supervision and channel teardown on loss of lock
    (Channel::Error/Kill, objects/channel.cpp:945,988; osgnss falls back
    PULL_IN -> ACQUISITION on timeout, osgpsisr.c:651-670),
  * re-queue of dropped SVs for later re-acquisition,
  * Patience-style stall watchdog on the sample source
    (objects/patience.cpp:80-104).

TPU-first structure: the device tracks a fixed [C]-slot channel bank (one
scan program, vmapped over slots — slot count never changes, so nothing
recompiles); the manager runs on the host at epoch boundaries (default
100 ms), where it reads back prompt statistics, assesses lock
(tracking.lock), swaps PRNs in and out of slots, and emits telemetry.

Pipelined superepochs (sync_every > 1): where the reference hides its
host/device latency with 10 threads and a 4000-deep FIFO
(objects/fifo.cpp), this manager hides it by BATCHING — one superepoch =
one wire-format sample upload + ONE fused device dispatch (a lax.scan
over sync_every epochs incl. device summaries and the sample_pos
retarget) + an acquisition search on the same device chunk when due +
ONE bulk readback. The device never waits on the host inside a
superepoch; supervision decisions run on results that are up to
sync_every epochs stale (the reference's channels likewise act on
delayed measurements, objects/correlator.cpp:263 3-deep buffer). Lock
statistics are computed on device (tracking.lock.assess_device) so the
steady-state readback is the prompt streams + bookkeeping only.

Prefetch pipeline (prefetch=True): on top of the batching, the device
runs FREE — the carried state needs no host rebase between
superepochs, so superepoch n dispatches while a reader thread reads +
uploads chunk n+1 and the host supervises superepoch n-1 (one more
superepoch of decision lag, budgeted in the window margin; bit-exact
vs the serial loop absent slot churn). readback='compact' ships the
per-block observables as one byte-packed buffer at ~2x fewer bytes;
history_window_ms bounds live-session memory.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.acquisition import acquire
from gnsstpu.acquisition.search import acq_samples_needed
from gnsstpu.config import ReceiverConfig
from gnsstpu.runtime.telemetry import Telemetry
from gnsstpu.signals.registry import get_signal
from gnsstpu.tracking import lock as tlock


class SlotState(enum.Enum):
    IDLE = "idle"
    # Post-acquisition probation: the slot tracks, but must show lock for
    # confirm_m of the first confirm_epochs supervision epochs or it is
    # dropped (the reference's ch_confirm M-of-N false-alarm screen,
    # osgpsisr.c:475-520, realized on lock-detector epochs).
    CONFIRM = "confirm"
    TRACKING = "tracking"


@dataclasses.dataclass
class Slot:
    state: SlotState = SlotState.IDLE
    prn: int = 0
    bad_epochs: int = 0
    started_ms: int = 0
    confirm_good: int = 0
    confirm_seen: int = 0


@dataclasses.dataclass
class EpochRecord:
    """Per-epoch per-slot observables kept by the manager."""

    epoch_ms: int
    prn: np.ndarray           # [C] (0 = idle)
    cn0_dbhz: np.ndarray      # [C]
    pll_lock: np.ndarray      # [C]
    doppler_hz: np.ndarray    # [C]


@dataclasses.dataclass
class _Inflight:
    """A dispatched-but-unsupervised superepoch (prefetch pipeline)."""

    e0: int                   # first supervision epoch index
    k: int                    # epochs in this superepoch
    base: int                 # chunk base sample
    packed: tuple             # device (streams [k,E,C,L], stats [k,C,4])
    acq_fut: object           # device acq peak metrics or None
    acq_want: list            # PRNs the acq searched for
    acq_host: bool            # host-path fallback search pending
    buf: object               # host chunk (fine-Doppler refinement)
    n_active: int
    t_read: float
    t_up: float
    t_disp: float
    # Future materializing (packed_np, acq_np) on the fetch thread: the
    # tunnel/PCIe readback overlaps the NEXT superepoch's dispatch +
    # supervision instead of stalling the harvest (copy_to_host_async
    # alone is not proactively drained by every transport).
    fetch: object = None
    # Stream base the acq metrics' code_phase is measured against (the
    # chunk base, or the weak accumulation's FIRST chunk base).
    acq_base: int = 0


@dataclasses.dataclass
class _Chunk:
    """A prefetched superepoch chunk (host buffer + device upload)."""

    base: int
    k: int
    buf: object
    dev: object               # device f32 [chunk_len, 2] or None if ended
    ended: bool
    need_len: int
    t_read: float
    t_up: float


class ChannelManager:
    """Supervises a fixed bank of tracking slots over a sample source.

    sync_every: supervision epochs per device round-trip (superepoch).
      1 = classic lockstep loop; >1 = pipelined mode with device-side
      lock assessment and decisions stale by up to sync_every epochs.
    wire: host->device sample wire format — 'auto' uses
      source.wire_format when the source provides read_packed()
      (ops.unpack formats: 'iq8'/'iq4'/'sm2'/'iq1'), else the plain
      float/int array path.
    mesh: a jax.sharding.Mesh — run the SAME receiver MULTI-CHIP:
      the slot bank, tracking state, and every [C]-leaved device
      buffer shard over mesh[mesh_axis] (channel parallelism, SURVEY
      §2.8 DP slot), the sample chunk replicates, and the production
      fused Pallas engine runs per-device under shard_map
      (tracking.engines + parallel.fused_shard; the XLA scan engines
      shard through GSPMD). n_channels must divide the axis size.
      Tracking output is bit-exact vs the unsharded manager
      (tests/test_parallel.py manager parity).
    """

    def __init__(self, source, cfg: ReceiverConfig,
                 telemetry: Optional[Telemetry] = None,
                 epoch_ms: int = 100, drop_after_epochs: int = 3,
                 reacq_period_ms: int = 500,
                 cn0_drop_dbhz: float = 32.0,
                 prn_pool: Optional[List[int]] = None,
                 stall_timeout_s: float = 30.0,
                 confirm_epochs: int = 3, confirm_m: int = 2,
                 commands=None, engine: str = "auto", navigator=None,
                 sync_every: int = 1, wire: str = "auto",
                 spread_budget_s: float = 900.0,
                 prefetch: bool = False, readback: str = "f32",
                 history_window_ms: Optional[int] = None,
                 mesh=None, mesh_axis: str = "channel"):
        self.source = source
        self.cfg = cfg
        self.sig = cfg.signal
        self.sd = get_signal(self.sig.signal)
        self.tlm = telemetry or Telemetry()
        self.epoch_ms = epoch_ms
        self.drop_after = drop_after_epochs
        self.reacq_period_ms = reacq_period_ms
        self.cn0_drop = cn0_drop_dbhz
        self.pool = list(prn_pool if prn_pool is not None
                         else range(1, self.sd.num_prn + 1))
        self.stall_timeout_s = stall_timeout_s
        self.confirm_epochs = confirm_epochs
        self.confirm_m = confirm_m
        self.commands = commands   # CommandBus (runtime/console.py)
        # OnlineNavigator (runtime/navigator.py): live ephemeris decode +
        # PVT at epoch boundaries (the reference's Ephemeris+PVT threads).
        self.navigator = navigator
        self.sync_every = max(1, int(sync_every))
        # Prefetch pipeline (run_pipelined): a reader thread reads +
        # uploads chunk n+1 while chunk n computes and chunk n-1 is
        # supervised. Supervision decisions lag one EXTRA superepoch vs
        # the serial loop (the reference's channels likewise act on
        # delayed measurements); tracking output is bit-exact vs serial
        # when no slot churn intervenes.
        self.prefetch = bool(prefetch)
        # readback='compact' halves the per-superepoch device->host
        # volume: prompts/rem in f16 (nav bit decode + viz need sign and
        # ~3 significant digits; lock stats are computed ON DEVICE in
        # f32), blksize as a lossless int16 delta from the nominal code
        # period, Doppler kept f32 (it drives the exact integer
        # carrier-NCO mirror, tracking.carrier). 'f32' is the default
        # full-precision wire.
        if readback not in ("f32", "compact"):
            raise ValueError(f"readback {readback!r}")
        self.readback = readback
        self._src_lock = threading.Lock()
        self._alloc_log: Optional[list] = None
        self._chunk_cache = None        # (base, host buf) of last chunk
        self._consec_restarts = 0
        self._stop = False
        # SV_Select warm start (sv_select.cpp SetupRequest): the live
        # navigator publishes predicted-visible PRNs from a decoded
        # almanac + fix; searches then skip almanac-known PRNs that are
        # below the mask (unknown PRNs stay searchable).
        self.warm_visible: Optional[set] = None
        self.warm_known: set = set()

        if wire == "auto":
            wire = (getattr(source, "wire_format", None)
                    if hasattr(source, "read_packed") else None)
        self.wire = wire                       # None = plain array reads

        C = cfg.n_channels
        self.slots = [Slot() for _ in range(C)]
        spc = self.sig.samples_per_code
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None:
            ax = dict(zip(mesh.axis_names, mesh.devices.shape))
            if mesh_axis not in ax:
                raise ValueError(f"mesh has no axis {mesh_axis!r}")
            if C % ax[mesh_axis]:
                raise ValueError(
                    f"n_channels {C} not divisible by mesh axis "
                    f"{mesh_axis!r} size {ax[mesh_axis]}")
        # Production engine behind a per-family adapter: GPS-style 1 ms
        # codes (scan or fused Pallas), Galileo BOC double-estimator
        # (4 ms blocks), GLONASS L3 data+pilot — the SAME supervision
        # loop drives all of them (tracking.engines). With a mesh, the
        # engine is the sharded multi-chip form (channels over
        # mesh[mesh_axis]).
        from gnsstpu.tracking.engines import make_engine
        self.eng = make_engine(cfg, engine, mesh=mesh,
                               mesh_axis=mesh_axis)
        self.engine = self.eng.name
        if epoch_ms % self.eng.period_ms:
            raise ValueError(
                f"epoch_ms {epoch_ms} not a multiple of the signal's "
                f"code period {self.eng.period_ms} ms")
        self._bpe = epoch_ms // self.eng.period_ms   # blocks per epoch
        self._bank = self.eng.new_bank(C)
        self._state = self.eng.init_state(C)
        if mesh is not None:
            # Shard the carried tracking state over the channel axis
            # from the start; every subsequent update (.at[].set slot
            # writes, the jitted super-step) preserves the placement,
            # so GSPMD partitions the whole receiver program.
            self._state = jax.tree.map(self._put_dev, self._state)
        # Device-resident copy of the slot bank; slot swaps update rows
        # in place (re-uploading the fused phase-row tables every epoch
        # would dominate epoch wall time).
        self._bank_dev = None
        self._abs_pos = np.zeros(C, np.float64)    # per-slot next sample
        self._cursor = 0                           # epoch base sample
        self._next_reacq_ms = 0
        self._clock_epochs = 0     # monotonic receiver clock (epochs)
        # Window slack: per-superepoch code-Doppler drift PLUS the
        # inter-channel code-phase spread that accumulates over a live
        # session (channels advance a fixed number of code periods per
        # epoch at slightly different code rates, <= ~6.4e-6 * fs per
        # second differential for opposite +-5 kHz Doppler). A channel
        # that outruns the budget is dropped for re-acquisition
        # (window_overrun event), which re-anchors it at the stream
        # head — the self-healing a live receiver needs on multi-hour
        # runs. (Memory is bounded separately: see history_window_ms
        # below — unbounded live sources default to a 36 s window.)
        # The margin budgets BOTH the static inter-channel spread —
        # acquisition hands off code phases anywhere in [0, spc), so
        # up to one code period of spread exists from the first epoch —
        # and the accumulated differential code-Doppler drift.
        lag = 2 if self.prefetch else 1   # pipeline adds one superepoch
        self._drift_margin = 64 + spc + int(np.ceil(
            lag * self.sync_every * epoch_ms * 1e-3 * 2e-5 * self.sig.fs
            + spread_budget_s * 6.4e-6 * self.sig.fs))
        # Bounded live retention (reference bound: the fixed 4000-deep
        # FIFO + fixed-length trackResults arrays): with a window, per-
        # PRN prompt history older than history_window_ms is evicted
        # (head-trimmed whole epoch chunks; h['evicted'] counts dropped
        # code periods so navigator index math stays absolute) and
        # `records` keeps only the trailing window. None = unbounded
        # for FINITE sources (offline analysis); an UNBOUNDED live
        # source (StreamSource and friends report len >= 2^61) defaults
        # to a 36 s window — enough for every family's ephemeris frame
        # cycle (GPS 30 s LNAV frame, GLONASS strings 1-4, BeiDou D1,
        # Galileo I/NAV nominal sub-frame) — so a multi-hour live run
        # holds constant memory by construction, like the reference's
        # fixed FIFO. Pass an explicit window (or a huge one) to
        # override.
        if history_window_ms is None:
            try:
                unbounded = len(source) >= 2 ** 61
            except TypeError:      # no __len__: endless by contract
                unbounded = True
            if unbounded:
                history_window_ms = 36_000
        self.history_window_ms = history_window_ms
        self.records: List[EpochRecord] = []
        self.history: Dict[int, dict] = {}         # prn -> prompt streams
        self._summarize = self._make_summarize()
        self._unpack_jit = None
        if self.wire is not None:
            from gnsstpu.ops import unpack as _unpack
            self._unpack_jit = jax.jit(
                lambda p: _unpack.unpack(p, self.wire))
        self._acq_chunk_fn = None   # lazy jitted on-chunk acq program
        self._acq_offs = None       # FDMA channel offsets (on-chunk acq)
        # Cross-superepoch weak-tier accumulation (VERDICT r4 item 3):
        # when the configured noncoherent search needs more samples
        # than one superepoch chunk holds (the reference buffers
        # 310 ms to make weak searches routine, acquisition.cpp:95),
        # a [P(or K), D, spc] partial-sum cube persists in HBM and
        # each uploaded chunk's windows accumulate into it — the weak
        # search rides the prefetch pipeline, zero host-path reads.
        self._acq_wk = None         # {"cube", "done", "base0"}
        self._acq_wk_fns = False    # lazy (accum, finish, B, B_c, need)
        # Fixed superepoch chunk / per-epoch window geometry: one
        # compiled tracker program regardless of sync_every or tail
        # length. The tracker sees only its epoch's window (the fused
        # kernel keeps the window VMEM-resident); between chained calls
        # sample_pos is rebased one epoch on device.
        espc = self._bpe * spc
        self._espc = espc
        self._win_len = espc + spc + self._drift_margin + 2
        self._chunk_len = (self.sync_every - 1) * espc + self._win_len
        if self.wire is not None:
            from gnsstpu.ops.unpack import align
            self._chunk_len += (-self._chunk_len) % align(self.wire)
        engine_step = self.eng.make_step(self._bpe)

        @jax.jit
        def step_epoch(win, bank, state):
            state, obs = engine_step(win, bank, state)
            state = state._replace(corr=state.corr._replace(
                sample_pos=state.corr.sample_pos - espc))
            return state, obs

        self._step_epoch = step_epoch
        # Prefetch mode fuses a whole superepoch (k epochs + device
        # summaries + the sample_pos retarget) into ONE jitted scan
        # program: on a high-RTT host<->device link, per-epoch dispatch
        # issue alone otherwise dominates the wall clock.
        self._super_steps: Dict[int, object] = {}

    # --- device placement (single-chip or mesh-sharded) ---

    def _put_dev(self, x) -> jax.Array:
        """Device placement for a manager-owned buffer: on a mesh,
        [C]-leading arrays shard over the channel axis, everything
        else replicates; without a mesh, plain upload."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        if x.ndim >= 1 and x.shape[0] == self.cfg.n_channels:
            spec = P(self.mesh_axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # --- slot control ---

    def _alloc(self, slot_idx: int, prn: int, code_phase: float,
               doppler_hz: float, epoch_ms: int) -> None:
        s = self.slots[slot_idx]
        s.state = (SlotState.CONFIRM if self.confirm_epochs > 0
                   else SlotState.TRACKING)
        s.prn = prn
        s.bad_epochs = 0
        s.confirm_good = 0
        s.confirm_seen = 0
        s.started_ms = epoch_ms
        # Engine adapter fills the slot's code tables + per-slot consts
        # (FDMA carrier offsets included) in the host bank; changed rows
        # are pushed to the device copy in place (one PRN's rows ride
        # the next dispatch instead of re-uploading the whole bank).
        self.eng.write_slot(self._bank, slot_idx, prn)
        if self._bank_dev is not None:
            for key in self.eng.slot_keys:
                if key in self._bank:
                    self._bank_dev[key] = self._bank_dev[key].at[
                        slot_idx].set(self._bank[key][slot_idx])
        # Reset the slot's state row ON DEVICE (.at[].set dispatches
        # async — a host round trip here would drain the pipeline).
        # sample_pos is rewritten (chunk-relative) at dispatch/retarget.
        z = self.eng.slot_state(doppler_hz)
        self._state = jax.tree.map(
            lambda full, one: jnp.asarray(full).at[slot_idx].set(
                jnp.asarray(one)[0].astype(jnp.asarray(full).dtype)),
            self._state, z)
        self._abs_pos[slot_idx] = code_phase
        if self._alloc_log is not None:
            self._alloc_log.append(slot_idx)
        # A re-acquired PRN's stream RESTARTS: continuing the old history
        # across the tracking gap would leave a discontinuity (and the
        # pre-drop garbage) in the bit stream that breaks frame sync and
        # pseudorange alignment downstream. start_ms changing tells the
        # navigator to invalidate its anchors for this PRN.
        self.history[prn] = self._new_history(slot_idx, epoch_ms,
                                              doppler_hz)
        self.tlm.event(epoch_ms, "channel_start", chan=slot_idx, prn=prn,
                       code_phase=round(float(code_phase), 1),
                       doppler_hz=round(float(doppler_hz), 1))

    def _new_history(self, slot_idx: int, start_ms: int,
                     doppler_hz: float, evicted: int = 0) -> dict:
        """Fresh per-PRN history dict — the ONE construction site for
        the stream lanes (_alloc and restore_checkpoint both use it;
        adding a lane in only one place was a latent divergence).
        Includes the integrated carrier-phase accumulator
        (TakeMeasurements role): a host mirror of the correlator's
        uint32 carrier NCO, fed from the Doppler/blksize streams
        (tracking.carrier)."""
        from gnsstpu.tracking.carrier import CarrierPhaseAccumulator

        hist = {"i_p": [], "q_p": [], "carr_doppler": [],
                "abs_sample": [], "carr_cycles": [],
                "start_ms": start_ms, "evicted": evicted,
                "_cph": CarrierPhaseAccumulator(
                    int(self._bank["carr_base"][slot_idx]), self.sig.fs,
                    doppler_hz)}
        if self.eng.has_data_component:
            hist["i_p2"] = []
            hist["q_p2"] = []
        return hist

    def _drop(self, slot_idx: int, epoch_ms: int, why: str) -> None:
        s = self.slots[slot_idx]
        self.tlm.event(epoch_ms, "channel_drop", chan=slot_idx, prn=s.prn,
                       why=why)
        s.state = SlotState.IDLE
        s.prn = 0
        s.bad_epochs = 0

    def _tracked_prns(self) -> set:
        return {s.prn for s in self.slots if s.state is not SlotState.IDLE}

    def _want_prns(self) -> list:
        want = [p for p in self.pool if p not in self._tracked_prns()]
        if self.warm_visible is not None:
            want = [p for p in want
                    if p not in self.warm_known or p in self.warm_visible]
        return want

    # --- sample reads (wire-format aware) ---

    def _read_superepoch(self, base: int, k: int):
        """One superepoch's chunk: sized read + end-of-data detection +
        zero-pad to the static chunk length.

        The tail superepoch (k < sync_every) reads only what its k epoch
        windows consume — a live source must not block waiting for
        samples beyond the run — and the pad lies beyond every epoch's
        window slice, so the compiled device programs keep their shapes.
        Thread-safe vs other source consumers (prefetch worker)."""
        chunk_len = self._chunk_len
        need_len = (k - 1) * self._espc + self._win_len
        if self.wire is not None:
            from gnsstpu.ops.unpack import align, samples_per_byte
            need_len += (-need_len) % align(self.wire)
        need_len = min(need_len, chunk_len)
        with self._src_lock:
            buf = self._read_chunk(base, need_len)
            if self.wire is not None:
                # Packed zero bytes still decode to nonzero LUT values,
                # so end-of-data for a packed source is positional (live
                # packed streams report producer EOS via ended_at).
                ended = base >= len(self.source) or (
                    hasattr(self.source, "ended_at")
                    and self.source.ended_at(base))
            else:
                # Positional end for sized finite sources; the all-zero
                # heuristic only for unsized/endless ones (a zero-filled
                # DROPOUT mid-recording must trigger channel drops +
                # reacquisition, not terminate the whole run).
                try:
                    src_len = len(self.source)
                except TypeError:
                    src_len = None
                if src_len is not None and src_len < 2 ** 61:
                    ended = base >= src_len
                else:
                    ended = not np.any(buf[: self._espc])
        if need_len < chunk_len:
            if self.wire is not None:
                spb = samples_per_byte(self.wire)
                pad_shape: tuple = (int((chunk_len - need_len) / spb),)
                pad_dtype = np.uint8
            else:
                pad_shape = (chunk_len - need_len, 2)
                pad_dtype = np.float32
            if isinstance(buf, jax.Array):
                buf = jnp.concatenate(
                    [buf, jnp.zeros(pad_shape, pad_dtype)])
            else:
                buf = np.concatenate(
                    [np.asarray(buf), np.zeros(pad_shape, pad_dtype)])
        self._consec_restarts = 0
        return buf, ended, need_len

    def _read_chunk(self, start: int, count: int):
        """Read one superepoch's samples: packed wire sources return raw
        bytes, others float/int [count, 2] (end-of-data detection happens
        in _run_superepoch)."""
        if self.wire is not None:
            return self.source.read_packed(start, count)
        return self.source.read(start, count)

    def _to_device(self, buf) -> jax.Array:
        """Upload + decode to f32 [N, 2] on device (unpack jit-deferred).
        Device-resident sources (DevicePackedArraySource) hand back jax
        arrays — no upload, just the on-device unpack."""
        if self.wire is not None:
            if not isinstance(buf, jax.Array):
                buf = jax.device_put(np.asarray(buf))
            out = self._unpack_jit(buf)
        else:
            out = jnp.asarray(buf)
            if out.dtype != jnp.float32:
                out = out.astype(jnp.float32)
        if self.mesh is not None:
            # Replicate the sample chunk across the mesh (channels need
            # the full window; HBM cost is per-chip, like the
            # reference's shared sample FIFO feeding all 12 channels).
            from jax.sharding import NamedSharding, PartitionSpec as P
            out = jax.device_put(out, NamedSharding(self.mesh, P()))
        return out

    # --- acquisition scheduling (SV_Select::Acquire equivalent) ---

    def _try_acquire(self, epoch_ms: int) -> None:
        """Host-path acquisition: reads its own sample window (used when
        nothing is tracking yet, or for FDMA signals)."""
        idle = [i for i, s in enumerate(self.slots)
                if s.state is SlotState.IDLE]
        want = self._want_prns()
        if not idle or not want:
            return
        acq_cfg = dataclasses.replace(self.cfg.acq, prn_list=tuple(want))
        need = acq_samples_needed(self.sig, acq_cfg)
        if self.wire is not None:
            # Packed sources decode exhausted regions to DC, not zeros.
            if self._cursor + need > len(self.source) or (
                    hasattr(self.source, "ended_at")
                    and self.source.ended_at(self._cursor + need)):
                return
        try:
            with self._src_lock:
                samples = self.source.read(self._cursor, need)
        except TimeoutError:
            if self._recover_stall(epoch_ms):
                return
            raise
        if not np.any(samples):
            return
        fdma = self.sd.fdma_zero_prn is not None
        if fdma:
            from gnsstpu.acquisition.search import acquire_fdma
            res = acquire_fdma(samples, self.sig, acq_cfg)
        else:
            res = acquire(samples, self.sig, acq_cfg)
        self._place(res, idle, want, self._cursor, epoch_ms, fdma=fdma)

    def _place(self, res, idle: list, want: list, base: int,
               epoch_ms: int, fdma: bool) -> None:
        """Allocate detected PRNs into idle slots (handoff to tracking)."""
        order = np.argsort(-res.peak_metric)
        for i in order:
            prn = int(i) + 1
            if (not res.detected[i] or prn not in want
                    or prn in self._tracked_prns()):
                continue
            if not idle:
                break
            slot = idle.pop(0)
            dopp = float(res.carr_freq[i]) - self.sig.if_freq
            if fdma:   # Doppler relative to this PRN's own channel carrier
                dopp -= (self.sd.carrier_freq(prn)
                         - self.sd.carrier_freq(self.sd.fdma_zero_prn))
            self._alloc(slot, prn,
                        code_phase=base + float(res.code_phase[i]),
                        doppler_hz=dopp, epoch_ms=epoch_ms)

    def _acq_grid(self):
        """Search-grid geometry shared by the on-chunk search and the
        weak-tier accumulator — ONE construction site so the
        code_phase/doppler_bin interpretation in _finish_chunk_acq can
        never desynchronize between the two paths.

        CDMA: all-PRN code bank against the Doppler grid. FDMA
        (GLONASS L1/L2): one shared code row against the flattened
        channel x Doppler carrier grid (acquisition.search.acquire_fdma
        semantics, reference GLONASS/L1/acquisition.sci:95-193).
        Sets the self._acq_offs / self._acq_doppler side channel and
        returns (fd_re, fd_im, grid_dev, fdma, K, D, spchip)."""
        from gnsstpu.ops import fft_acquire

        acq = self.cfg.acq
        sig = self.sig
        fd_re, fd_im = fft_acquire.code_fd_table(
            sig.signal, sig.fs, sig.code_freq, sig.code_length,
            acq.coherent_ms)
        fdma = self.sd.fdma_zero_prn is not None
        if fdma:
            fd_re, fd_im = fd_re[:1], fd_im[:1]   # one shared code
            carr_all = np.array([self.sd.carrier_freq(p)
                                 for p in range(1, self.sd.num_prn + 1)])
            offs = carr_all - self.sd.carrier_freq(self.sd.fdma_zero_prn)
            dopp = fft_acquire.doppler_grid(
                0.0, acq.doppler_band, acq.doppler_bin_step())
            grid = (sig.if_freq + offs[:, None]
                    + dopp[None, :]).reshape(-1)
            self._acq_offs = offs
        else:
            dopp = fft_acquire.doppler_grid(
                sig.if_freq, acq.doppler_band, acq.doppler_bin_step())
            grid = dopp
            self._acq_offs = None
        self._acq_doppler = dopp
        return (jnp.asarray(fd_re), jnp.asarray(fd_im),
                jnp.asarray(grid, jnp.float32), fdma,
                self.sd.num_prn, len(dopp),
                round(sig.fs / sig.code_freq))

    def _make_acq_chunk_fn(self):
        """Jitted cold-search over the leading window of an already
        uploaded device chunk — the pipelined path's reacquisition rides
        the superepoch's transfer instead of paying its own (grid
        semantics: _acq_grid)."""
        from gnsstpu.acquisition.search import _windows_of
        from gnsstpu.ops import fft_acquire

        acq = self.cfg.acq
        sig = self.sig
        spc = sig.samples_per_code
        B, combine = _windows_of(acq)
        L = acq.coherent_ms * spc
        Lw = fft_acquire.window_len(spc, acq.coherent_ms)
        fd_re, fd_im, grid_dev, fdma, K, D, spchip = self._acq_grid()

        @jax.jit
        def search(chunk):
            blocks = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(chunk, k * L, Lw)
                 for k in range(B)])
            cube = fft_acquire.acquire_cube(
                blocks, fd_re, fd_im, grid_dev, sig.fs, spc,
                combine=combine)
            if fdma:
                cube = cube.reshape(K, D, spc)
            m = fft_acquire.peak_metrics(
                cube, samples_per_code=spc, samples_per_chip=spchip)
            # ONE [3, P] f32 buffer (per-leaf fetches cost ~RTT each on
            # a tunneled link); code_phase < spc and bin counts are
            # exact in f32.
            return jnp.stack([m["metric"],
                              m["code_phase"].astype(jnp.float32),
                              m["doppler_bin"].astype(jnp.float32)])

        return search

    def _acq_samples_needed_chunk(self) -> int:
        from gnsstpu.acquisition.search import _windows_of
        from gnsstpu.ops import fft_acquire

        B, _ = _windows_of(self.cfg.acq)
        spc = self.sig.samples_per_code
        return ((B - 1) * self.cfg.acq.coherent_ms * spc
                + fft_acquire.window_len(spc, self.cfg.acq.coherent_ms))

    # --- cross-superepoch weak-tier acquisition ---

    def _make_acq_wk(self):
        """Lazy-build the weak-tier accumulation programs: one jitted
        partial noncoherent accumulate per chunk (B_c windows summed
        into the persistent device cube, code-phase axis rolled into
        the accumulation's base frame) and one jitted finisher
        (peak_metrics over the summed cube). Returns None when the
        config cannot accumulate (not a sum-combined tier, or the
        chunk cannot hold even one coherent window)."""
        if self._acq_wk_fns is not False:
            return self._acq_wk_fns
        from gnsstpu.acquisition.search import _windows_of
        from gnsstpu.ops import fft_acquire

        acq = self.cfg.acq
        sig = self.sig
        spc = sig.samples_per_code
        B, combine = _windows_of(acq)
        L = acq.coherent_ms * spc
        Lw = fft_acquire.window_len(spc, acq.coherent_ms)
        # Windows per chunk are sized to the steady chunk ADVANCE
        # (k*espc), not the chunk length: consecutive chunks overlap by
        # win_len - espc samples, and windows reaching into the overlap
        # would enter the noncoherent sum twice (miscounting 'done' and
        # shifting the false-alarm calibration). The sliver between the
        # last fitting window and the next chunk's base is skipped —
        # honest, slightly slower integration beats double-counting.
        # When the advance is shorter than ONE coherent window, no
        # non-overlapping window fits at all — accumulating would
        # re-admit the double-count, so the config is unsupported and
        # the host full-buffer path takes over.
        adv = self._espc * self.sync_every
        if combine != "sum" or Lw > self._chunk_len or adv < Lw:
            self._acq_wk_fns = None
            return None
        B_c = min(B, (adv - Lw) // L + 1)
        need = (B_c - 1) * L + Lw      # samples one accumulate reads
        fd_re, fd_im, grid_dev, fdma, K, D, spchip = self._acq_grid()

        @jax.jit
        def accum(chunk, cube, roll):
            blocks = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(chunk, k * L, Lw)
                 for k in range(B_c)])
            part = fft_acquire.acquire_cube(
                blocks, fd_re, fd_im, grid_dev, sig.fs, spc,
                combine="sum")
            if fdma:
                part = part.reshape(K, D, spc)
            # Later chunks start at a different stream base: rotate the
            # code-phase axis into the FIRST chunk's frame so the sums
            # align (a peak for code start s sits at (s - base) mod spc).
            part = jnp.roll(part, roll, axis=-1)
            return cube + part

        @jax.jit
        def finish(cube):
            m = fft_acquire.peak_metrics(
                cube, samples_per_code=spc, samples_per_chip=spchip)
            return jnp.stack([m["metric"],
                              m["code_phase"].astype(jnp.float32),
                              m["doppler_bin"].astype(jnp.float32)])

        self._acq_wk_fns = (accum, finish, B, B_c, need)
        return self._acq_wk_fns

    def _wk_step(self, chunk_dev, base: int, need_len: int):
        """Advance the cross-superepoch weak search by one chunk.
        Returns ('unsupported', None, 0) | ('pending', None, 0) |
        ('done', metrics_fut [3, P], base0)."""
        fns = self._make_acq_wk()
        if fns is None:
            return ("unsupported", None, 0)
        accum, finish, B, B_c, need = fns
        if need_len < need:
            # Tail/short chunk: pause, keep the accumulated cube.
            return ("pending", None, 0)
        spc = self.sig.samples_per_code
        if self._acq_wk is None:
            # Cube rows: every PRN (CDMA code bank) or every frequency
            # channel (FDMA), both = sd.num_prn.
            self._acq_wk = {
                "cube": jnp.zeros(
                    (self.sd.num_prn, len(self._acq_doppler), spc),
                    jnp.float32),
                "done": 0, "base0": int(base)}
        wk = self._acq_wk
        roll = np.int32((int(base) - wk["base0"]) % spc)
        wk["cube"] = accum(chunk_dev, wk["cube"], roll)
        wk["done"] += B_c
        if wk["done"] >= B:
            fut = finish(wk["cube"])
            base0 = wk["base0"]
            self._acq_wk = None
            return ("done", fut, base0)
        return ("pending", None, 0)

    def _host_samples(self, start: int, count: int) -> np.ndarray:
        """f32 [count, 2] host samples, served from the retained chunk
        buffer when it covers the request (the live loop must not pay an
        extra source read per refinement) else from the source."""
        cc = self._chunk_cache
        if cc is not None:
            cbase, cbuf = cc
            off = start - cbase
            if off >= 0:
                if self.wire is not None:
                    from gnsstpu.ops import unpack as up
                    a = up.align(self.wire)
                    spb = up.samples_per_byte(self.wire)
                    o0 = off - off % a
                    n = count + (off - o0)
                    n += (-n) % a
                    if o0 + n <= int(len(cbuf) * spb):
                        dec = up.unpack_np(
                            np.asarray(cbuf)[int(o0 / spb):
                                             int((o0 + n) / spb)],
                            self.wire)
                        return dec[off - o0: off - o0 + count]
                elif off + count <= len(cbuf):
                    return np.asarray(cbuf[off: off + count], np.float32)
        with self._src_lock:
            return self.source.read(start, count)

    def _finish_chunk_acq(self, metrics, want: list, base: int,
                          epoch_ms: int,
                          head: Optional[int] = None) -> None:
        """Apply an on-chunk acquisition's (already materialized) peak
        metrics: threshold, fine Doppler (host window), slot placement.
        head = first sample of the chunk the new slots will track in
        (defaults to the serial loop's cursor)."""
        from gnsstpu.acquisition.search import AcqResults, refine_doppler

        if head is None:
            head = self._cursor
        acq = self.cfg.acq
        metrics = np.asarray(metrics)
        metric = metrics[0]
        code_phase = metrics[1].astype(np.int64)
        best_bin = metrics[2].astype(np.int64)
        allowed = np.zeros(self.sd.num_prn, bool)
        allowed[[p - 1 for p in want]] = True
        detected = (metric > acq.threshold) & allowed
        fdma = self._acq_offs is not None
        carr = self._acq_doppler[best_bin].astype(np.float64)
        if fdma:   # absolute carrier: IF + channel offset + Doppler bin
            carr = carr + self.sig.if_freq + self._acq_offs
        if acq.fine_doppler_ms > 0 and np.any(detected):
            k_ms = acq.fine_doppler_ms
            win = self._host_samples(base, (k_ms + 1) * self.sig.
                                     samples_per_code + 64)
            # A weak cross-superepoch search's base can predate the
            # retained chunk AND a live stream's replay window, whose
            # read zero-fills the evicted part. Refining against a
            # PARTIALLY zero-filled window corrupts the Doppler (worse
            # than the coarse bin), so require essentially full sample
            # coverage before refining (noise samples are never
            # exactly 0+0j; fill is).
            covered = np.count_nonzero(
                np.abs(win).sum(axis=1)) >= 0.99 * len(win)
            if covered:
                for i in np.nonzero(detected)[0]:
                    carr[i] = refine_doppler(
                        win, self.sig, int(i) + 1, int(code_phase[i]),
                        carr[i], k_ms=k_ms)
        # The search measured code phase in THIS superepoch's chunk, but
        # the slot starts tracking at `head` — advance the handoff by
        # whole code periods. Each skipped code period spans
        # spc * (1 - fd/f_carrier) samples (code Doppler), so the
        # advance is Doppler-corrected: an uncorrected skip slips
        # doppler/1540 chips/s — several chips over a multi-second
        # superepoch at kHz Doppler, beyond DLL pull-in. Using the
        # corrected period in the ceil keeps the handoff AT OR PAST
        # head, so the slot's first window offset is never negative.
        spc = self.sig.samples_per_code
        abs_cp = base + code_phase.astype(np.float64)
        fc = np.array([self.sd.carrier_freq(p)
                       for p in range(1, self.sd.num_prn + 1)], np.float64)
        fd = carr - self.sig.if_freq
        if fdma:   # Doppler relative to each channel's own carrier
            fd = fd - self._acq_offs
        step = spc * (1.0 - fd / fc)
        adv = np.maximum(np.ceil((head - abs_cp) / step), 0.0)
        abs_cp = abs_cp + adv * step
        res = AcqResults(peak_metric=metric, code_phase=abs_cp,
                        carr_freq=carr, detected=detected)
        idle = [i for i, s in enumerate(self.slots)
                if s.state is SlotState.IDLE]
        self._place(res, idle, want, base=0, epoch_ms=epoch_ms,
                    fdma=fdma)

    # --- device-side epoch summary (pipelined readback) ---

    # Packed-summary lanes: streams [E, C, 5(+2)] and stats [C, 4].
    (_S_IP, _S_QP, _S_REM, _S_BLK, _S_DOPP, _S_IP2, _S_QP2) = range(7)
    (_T_CN0, _T_PLL, _T_CODE, _T_LOCKED) = range(4)

    def _make_summarize(self):
        m = min(20, max(1, self._bpe))
        dual = self.eng.has_data_component
        compact = self.readback == "compact"
        spc_nom = int(self.sig.samples_per_code)

        @jax.jit
        def summarize(obs, cn0_drop):
            # cn0_drop is a TRACED argument (not baked into the compiled
            # program) so the runtime 'set cn0_drop' command takes effect.
            stats = tlock.assess_device(
                obs.ie, obs.qe, obs.ip, obs.qp, obs.il, obs.ql,
                t_int_s=self.sig.code_period_s,
                cn0_drop_dbhz=cn0_drop, m=m)
            st = jnp.stack(
                [stats["cn0_dbhz"], stats["pll_lock"],
                 stats["code_lock"],
                 stats["locked"].astype(jnp.float32)], axis=-1)  # [C, 4]
            if compact:
                # Prompts scaled by 1/spc so f16 cannot overflow even
                # for raw i16-amplitude inputs (sum of spc samples of
                # |x|<=32767 -> <=32767 after scaling < 65504). rem
                # feeds abs_sample (pseudoranges), so it ships as u16
                # fixed point over [0,1) chips — ~1.5e-5 chip (~4 mm)
                # quantization, far below DLL noise, half of f32.
                pp = [obs.ip, obs.qp] + ([obs.ip2, obs.qp2]
                                         if dual else [])
                scale = np.float32(1.0 / spc_nom)
                rem_u16 = jnp.clip(
                    jnp.round(obs.rem * np.float32(65535.0)),
                    0, 65535).astype(jnp.uint16)
                return (jnp.stack([p * scale for p in pp],
                                  axis=-1).astype(jnp.float16),
                        rem_u16,
                        (obs.blksize - spc_nom).astype(jnp.int16),
                        obs.dopp, st)
            lanes = [obs.ip, obs.qp, obs.rem,
                     obs.blksize.astype(jnp.float32), obs.dopp]
            if dual:
                lanes += [obs.ip2, obs.qp2]
            streams = jnp.stack(lanes, axis=-1)        # [E, C, 5(+2)]
            return streams, st

        @jax.jit
        def pack(summaries):
            # A handful of [K, ...] leaves: the whole superepoch's
            # readback is a few host fetches instead of tens of
            # per-leaf round trips.
            return jax.tree.map(lambda *xs: jnp.stack(xs), *summaries)

        self._pack_epochs = pack
        return summarize

    def _decode_readback(self, raw):
        """Canonical (streams [K,E,C,L] f32, stats [K,C,4]) from a
        materialized (np) packed readback in either wire format."""
        if self.readback != "compact":
            return raw
        dual = self.eng.has_data_component
        if isinstance(raw, np.ndarray) and raw.dtype == np.uint8:
            # Byte-packed superepoch buffer (prefetch super_step).
            P = 4 if dual else 2
            E, C = self._bpe, self.cfg.n_channels
            per_k = E * C * (2 * P + 2 + 2 + 4) + C * 16
            K = raw.size // per_k
            n = [K * E * C * P * 2, K * E * C * 2, K * E * C * 2,
                 K * E * C * 4, K * C * 16]
            o = np.cumsum([0] + n)
            pp = np.frombuffer(raw[o[0]:o[1]],
                               np.float16).reshape(K, E, C, P)
            rem = (np.frombuffer(raw[o[1]:o[2]],
                                 np.uint16).reshape(K, E, C)
                   .astype(np.float32) / np.float32(65535.0))
            blkd = np.frombuffer(raw[o[2]:o[3]],
                                 np.int16).reshape(K, E, C)
            dopp = np.frombuffer(raw[o[3]:o[4]],
                                 np.float32).reshape(K, E, C)
            st = np.frombuffer(raw[o[4]:o[5]],
                               np.float32).reshape(K, C, 4)
        else:
            pp, rem, blkd, dopp, st = raw
            rem = rem.astype(np.float32) / np.float32(65535.0)
        K, E, C = dopp.shape
        L = 7 if dual else 5
        spc = np.float32(self.sig.samples_per_code)
        streams = np.empty((K, E, C, L), np.float32)
        streams[..., self._S_IP] = pp[..., 0].astype(np.float32) * spc
        streams[..., self._S_QP] = pp[..., 1].astype(np.float32) * spc
        streams[..., self._S_REM] = rem
        streams[..., self._S_BLK] = (blkd.astype(np.float32)
                                     + self.sig.samples_per_code)
        streams[..., self._S_DOPP] = dopp
        if dual:
            streams[..., self._S_IP2] = (pp[..., 2].astype(np.float32)
                                         * spc)
            streams[..., self._S_QP2] = (pp[..., 3].astype(np.float32)
                                         * spc)
        return streams, st

    # --- main loop ---

    def run(self, n_ms: int) -> List[EpochRecord]:
        """Process n_ms of signal. Epoch labels form ONE monotonic
        receiver clock across successive run() calls on the same
        manager (resume from clock_ms): slot started_ms / reacq /
        navigator schedules stay meaningful when a caller alternates
        run() with its own work (the reference's receiver time never
        restarts while the process lives)."""
        e0 = self._clock_epochs
        n_epochs = e0 + n_ms // self.epoch_ms
        self._last_progress = time.monotonic()
        if self.prefetch and self.sync_every > 1:
            self._run_pipelined(e0, n_epochs)
            return self.records
        e = e0
        while e < n_epochs:
            k = min(self.sync_every, n_epochs - e)
            advanced = self._run_superepoch(e, k)
            if not advanced:
                break
            e += k
            # Commit the clock per superepoch, not on loop exit: if a
            # later superepoch raises (device error, unrecoverable
            # stall), the epochs already supervised must stay consumed
            # — a retry run() must not re-issue their labels on new
            # data (duplicate epoch_ms in records/history).
            self._clock_epochs = e
        return self.records

    @property
    def clock_ms(self) -> int:
        """Receiver-clock milliseconds processed so far (the epoch
        label the next run() starts at)."""
        return self._clock_epochs * self.epoch_ms

    def _run_superepoch(self, e0: int, k: int) -> bool:
        """Process k supervision epochs in one device round-trip.
        Returns False to stop (end of data / commanded stop)."""
        spc = self.sig.samples_per_code
        epoch_ms0 = e0 * self.epoch_ms
        if self.commands is not None:
            self._apply_commands(epoch_ms0)
        if self._stop:
            self.tlm.event(epoch_ms0, "commanded_stop")
            return False

        # Host-path acquisition only when nothing tracks yet (no chunk
        # to ride); otherwise the search — CDMA and FDMA alike — rides
        # the uploaded superepoch chunk.
        active = [i for i, s in enumerate(self.slots)
                  if s.state is not SlotState.IDLE]
        acq_due = epoch_ms0 >= self._next_reacq_ms
        if acq_due and not active:
            t0 = time.perf_counter()
            self._try_acquire(epoch_ms0)
            self.tlm.task_health(epoch_ms0, "acquire",
                                 time.perf_counter() - t0)
            self._next_reacq_ms = epoch_ms0 + self.reacq_period_ms
            acq_due = False
            active = [i for i, s in enumerate(self.slots)
                      if s.state is not SlotState.IDLE]

        if not active:
            # Nothing tracking: advance the cursor k epochs.
            self._cursor += k * self._espc
            self._watchdog()
            return True

        # Park idle slots at the epoch base so their sample_pos stays
        # in range; rebase active slots.
        base = int(min(self._abs_pos[i] for i in active))
        if self.wire is not None:
            from gnsstpu.ops.unpack import align
            base -= base % align(self.wire)
        chunk_len = self._chunk_len
        for i, s in enumerate(self.slots):
            if s.state is SlotState.IDLE:
                self._abs_pos[i] = base

        t_read0 = time.perf_counter()
        try:
            buf, ended, need_len = self._read_superepoch(base, k)
        except TimeoutError:
            if self._recover_stall(epoch_ms0):
                return True
            raise
        if ended:
            self.tlm.event(epoch_ms0, "end_of_data")
            return False
        self._chunk_cache = (base, buf)
        rel = np.round(self._abs_pos - base).astype(np.int64)
        # A channel whose code phase has drifted past the window budget
        # would read beyond its per-epoch window: re-anchor it via
        # re-acquisition rather than tracking garbage. The hard budget is
        # rel <= win_len - espc - spc - 2 = _drift_margin: beyond that the
        # final block's dynamic slice clamps at the window edge and the
        # channel silently correlates shifted samples.
        for i in list(active):
            if rel[i] > self._drift_margin:
                self._drop(i, epoch_ms0, why="window_overrun")
                self._abs_pos[i] = base
                rel[i] = 0
                active.remove(i)
        if not active:
            self._cursor = base + k * self._espc
            return True

        # --- async device phase: upload, k chained dispatches, optional
        # on-chunk acquisition dispatch, then ONE bulk readback. ---
        t_up0 = time.perf_counter()
        chunk_dev = self._to_device(buf)
        if self._bank_dev is None:
            self._bank_dev = {key: self._put_dev(v)
                              for key, v in self._bank.items()}
        state = self._state._replace(
            corr=self._state.corr._replace(
                sample_pos=rel.astype(np.int32)))
        t_disp0 = time.perf_counter()
        espc = self._espc
        outs = []
        for j in range(k):
            win = jax.lax.slice_in_dim(chunk_dev, j * espc,
                                       j * espc + self._win_len)
            state, obs = self._step_epoch(win, self._bank_dev, state)
            outs.append(self._summarize(obs, np.float32(self.cn0_drop)))
        self._state = state

        acq_fut = None
        acq_base = base
        acq_host_fallback = False
        want = self._want_prns()
        have_idle = any(s.state is SlotState.IDLE for s in self.slots)
        if (acq_due or self._acq_wk is not None) and want and have_idle:
            if need_len >= self._acq_samples_needed_chunk():
                # Full search fits this chunk: any in-progress weak
                # accumulation is obsolete (its base would go stale).
                self._acq_wk = None
                if self._acq_chunk_fn is None:
                    self._acq_chunk_fn = self._make_acq_chunk_fn()
                acq_fut = self._acq_chunk_fn(chunk_dev)
            else:
                # Chunk too short for the configured search (a long
                # weak-tier window): accumulate noncoherent windows
                # across consecutive superepoch chunks ON DEVICE
                # (reference 310 ms buffered weak search,
                # acquisition.cpp:95-107); once the accumulation
                # completes, place slots from the summed cube. Only a
                # config that cannot accumulate at all (non-sum tier)
                # still pays the host-path search.
                st, fut, b0 = self._wk_step(chunk_dev, base, need_len)
                if st == "done":
                    acq_fut, acq_base = fut, b0
                elif st == "unsupported":
                    acq_host_fallback = acq_due
        elif not (want and have_idle):
            self._acq_wk = None
        if acq_due:
            self._next_reacq_ms = epoch_ms0 + self.reacq_period_ms

        # Bulk readback: K epochs packed into two device arrays = one
        # pipeline sync with two host fetches per superepoch.
        t_rb0 = time.perf_counter()
        packed = self._pack_epochs(outs)
        for leaf in jax.tree.leaves(packed):
            leaf.copy_to_host_async()
        streams, stats = self._decode_readback(
            jax.tree.map(np.asarray, packed))
        outs = [(streams[j], stats[j]) for j in range(k)]
        if acq_fut is not None:
            acq_fut = jax.tree.map(np.asarray, acq_fut)
        t_rb1 = time.perf_counter()
        self.tlm.task_health(epoch_ms0, "track", t_rb0 - t_disp0,
                             engine=self.engine, n_active=len(active),
                             sync_every=k)
        self.tlm.task_health(epoch_ms0, "upload", t_disp0 - t_up0,
                             wire=self.wire or "array",
                             read_s=round(t_up0 - t_read0, 4))
        self.tlm.task_health(epoch_ms0, "readback", t_rb1 - t_rb0)
        if hasattr(self.source, "stats"):
            # FIFO depth/overrun counters from a streaming source
            # (reference FIFO display, doxygen.h:113).
            self.tlm.task_health(epoch_ms0, "source", 0.0,
                                 **self.source.stats())

        # --- host supervision, per sub-epoch ---
        t_sup0 = time.perf_counter()
        pos = base + rel.astype(np.float64)
        pos = self._supervise_block([o[0] for o in outs],
                                    [o[1] for o in outs], pos, e0)
        self._abs_pos = pos
        self._cursor = base + k * self._espc
        self._last_progress = time.monotonic()
        self.tlm.task_health(epoch_ms0, "assess",
                             time.perf_counter() - t_sup0)

        if acq_fut is not None:
            self._finish_chunk_acq(acq_fut, want, acq_base,
                                   (e0 + k) * self.epoch_ms)
        elif acq_host_fallback:
            t0 = time.perf_counter()
            self._try_acquire((e0 + k) * self.epoch_ms)
            self.tlm.task_health((e0 + k) * self.epoch_ms, "acquire",
                                 time.perf_counter() - t0)
        return True

    # --- prefetch pipeline (overlapped superepochs) ---
    #
    # The serial loop strictly alternates host I/O with device compute:
    # read -> upload -> k dispatches -> readback -> supervise. The
    # reference hides exactly this latency with its 10-thread/FIFO
    # fabric (objects/fifo.cpp:53-187). Here the device state CARRIES
    # across superepochs (each epoch rebases sample_pos by -espc on
    # device, so after k epochs the state is already relative to the
    # next chunk's deterministic base) — dispatching superepoch n+1
    # needs NO host round trip. Per iteration:
    #   a. dispatch superepoch n on the prefetched chunk (async),
    #   b. spawn a reader-thread prefetch (read + upload) of chunk n+1,
    #   c. harvest + supervise superepoch n-1 (its async readback had a
    #      full superepoch of wall clock to complete).
    # Supervision decisions (drops, reacquisition placements) land one
    # superepoch later than serial; the window drift margin budgets the
    # extra lag, and tracking output is bit-exact vs the serial loop
    # whenever no slot churn intervenes (tests/test_pipeline.py).

    def _get_super_step(self, k: int):
        """One compiled program per superepoch length k:
        (chunk, bank, state, cn0_drop, delta, mask, newsp) ->
        (state', (streams [k,E,C,L], stats [k,C,4])). delta/mask/newsp
        retarget sample_pos (base tracking + fresh slot rows) inside
        the same dispatch."""
        fn = self._super_steps.get(k)
        if fn is not None:
            return fn
        espc = self._espc
        win_len = self._win_len
        step_epoch = self._step_epoch
        summarize = self._summarize
        compact = self.readback == "compact"

        @jax.jit
        def super_step(chunk, bank, state, cn0_drop, delta, mask,
                       newsp):
            sp = state.corr.sample_pos + delta
            sp = jnp.where(mask, newsp, sp)
            state = state._replace(corr=state.corr._replace(
                sample_pos=sp))

            def body(st, j):
                win = jax.lax.dynamic_slice_in_dim(
                    chunk, j * espc, win_len)
                st, obs = step_epoch(win, bank, st)
                return st, summarize(obs, cn0_drop)

            state, outs = jax.lax.scan(body, state,
                                       jnp.arange(k, dtype=jnp.int32))
            if compact:
                # ONE device->host buffer for the whole superepoch:
                # per-leaf fetches each pay a fixed link cost, so the
                # compact tuple's 5 leaves are bitcast to bytes and
                # concatenated (decoded by _decode_readback).
                outs = jnp.concatenate(
                    [jax.lax.bitcast_convert_type(
                        o, jnp.uint8).reshape(-1) for o in outs])
            return state, outs

        self._super_steps[k] = super_step
        return super_step

    def _prefetch_chunk(self, base: int, k: int) -> _Chunk:
        """Read + upload one superepoch chunk (runs on the reader
        thread; JAX dispatch is thread-safe)."""
        t0 = time.perf_counter()
        buf, ended, need_len = self._read_superepoch(base, k)
        t1 = time.perf_counter()
        dev = None if ended else self._to_device(buf)
        return _Chunk(base=base, k=k, buf=buf, dev=dev, ended=ended,
                      need_len=need_len, t_read=t1 - t0,
                      t_up=time.perf_counter() - t1)

    def _dispatch_superepoch(self, chunk: _Chunk, k: int, e0: int,
                             delta: int, mask: np.ndarray,
                             newsp: np.ndarray) -> _Inflight:
        """Issue one fused superepoch program (+ a due acquisition
        search) against an uploaded chunk — all device work is async.
        delta/mask/newsp retarget sample_pos to this chunk's base
        (carried-state base tracking, entry rebase, fresh slot rows)
        inside the dispatch."""
        epoch_ms0 = e0 * self.epoch_ms
        t0 = time.perf_counter()
        if self._bank_dev is None:
            self._bank_dev = {key: self._put_dev(v)
                              for key, v in self._bank.items()}
        self._state, packed = self._get_super_step(k)(
            chunk.dev, self._bank_dev, self._state,
            np.float32(self.cn0_drop), np.int32(delta), mask,
            newsp.astype(np.int32))
        for leaf in jax.tree.leaves(packed):
            leaf.copy_to_host_async()
        acq_fut = None
        acq_base = chunk.base
        acq_host = False
        want = []
        acq_due = epoch_ms0 >= self._next_reacq_ms
        if acq_due or self._acq_wk is not None:
            want = self._want_prns()
            have_idle = any(s.state is SlotState.IDLE
                            for s in self.slots)
            if want and have_idle:
                if (chunk.need_len
                        >= self._acq_samples_needed_chunk()):
                    self._acq_wk = None
                    if self._acq_chunk_fn is None:
                        self._acq_chunk_fn = self._make_acq_chunk_fn()
                    acq_fut = self._acq_chunk_fn(chunk.dev)
                    for leaf in jax.tree.leaves(acq_fut):
                        leaf.copy_to_host_async()
                else:
                    # Weak tier: accumulate this chunk's windows into
                    # the persistent device cube; the search completes
                    # (and places slots) once enough noncoherent
                    # windows summed — still zero host-path reads.
                    st, fut, b0 = self._wk_step(
                        chunk.dev, chunk.base, chunk.need_len)
                    if st == "done":
                        acq_fut, acq_base = fut, b0
                        for leaf in jax.tree.leaves(acq_fut):
                            leaf.copy_to_host_async()
                    elif st == "unsupported":
                        acq_host = acq_due
            else:
                self._acq_wk = None
            if acq_due:
                self._next_reacq_ms = epoch_ms0 + self.reacq_period_ms
        n_active = sum(s.state is not SlotState.IDLE
                       for s in self.slots)
        return _Inflight(e0=e0, k=k, base=chunk.base, packed=packed,
                         acq_fut=acq_fut, acq_want=want,
                         acq_host=acq_host, buf=chunk.buf,
                         n_active=n_active, t_read=chunk.t_read,
                         t_up=chunk.t_up,
                         t_disp=time.perf_counter() - t0,
                         acq_base=acq_base)

    def _next_base(self, active: list, la: int, k: int,
                   det: int) -> int:
        """Base for the NEXT chunk: follow the fleet's actual positions
        (min active, la superepochs of advance predicted on top of the
        bookkeeping lag, minus a guard for backward code-Doppler drift)
        so a long run's collective drift never walks rel negative or
        past the window budget."""
        guard = 128
        minp = min(self._abs_pos[i] for i in active)
        desired = int(minp) + la * k * self._espc - guard
        if self.wire is not None:
            from gnsstpu.ops.unpack import align
            desired -= desired % align(self.wire)
        if abs(desired - det) > self._drift_margin:
            # A mass slot change moved the min out of the budgeted
            # envelope; stay on the deterministic track (the entry
            # rebase heals via window_overrun re-anchors if needed).
            return det
        return desired

    def _materialize(self, p: _Inflight):
        """Fetch-thread body: block on the superepoch's device->host
        readback (numpy materialization releases the GIL during the
        transfer wait, so this overlaps the main thread's dispatch +
        supervision work). The packed buffer and the acq metrics fetch
        as ONE device_get (each separate fetch pays its own round trip
        on a high-RTT link), and the byte-unpack to canonical streams
        also runs here, off the supervision thread."""
        packed_np, acq = jax.device_get((p.packed, p.acq_fut))
        return self._decode_readback(packed_np), acq

    def _run_pipelined(self, e0: int, n_epochs: int) -> None:
        from concurrent.futures import ThreadPoolExecutor

        espc = self._espc
        ex = ThreadPoolExecutor(max_workers=1)
        fx = ThreadPoolExecutor(max_workers=1)   # readback fetcher
        pend: Optional[_Inflight] = None
        nxt = None                 # Future[_Chunk] targeting self._cursor
        entry = True               # host sample_pos rebase needed
        self._pending_allocs: List[int] = []
        self._det_base = 0
        e = e0
        try:
            while e < n_epochs:
                k = min(self.sync_every, n_epochs - e)
                epoch_ms0 = e * self.epoch_ms
                if self.commands is not None:
                    self._apply_commands(epoch_ms0)
                if self._stop:
                    self.tlm.event(epoch_ms0, "commanded_stop")
                    break
                active = [i for i, s in enumerate(self.slots)
                          if s.state is not SlotState.IDLE]
                if not active:
                    if pend is not None:
                        # Drain the in-flight superepoch first — its
                        # acquisition results may repopulate the bank.
                        self._harvest(pend, next_base=self._cursor,
                                      alloc_ms=epoch_ms0)
                        self._clock_epochs = e
                        pend = None
                        entry = True
                        continue
                    nxt = None
                    if epoch_ms0 >= self._next_reacq_ms:
                        t0 = time.perf_counter()
                        self._try_acquire(epoch_ms0)
                        self.tlm.task_health(
                            epoch_ms0, "acquire",
                            time.perf_counter() - t0)
                        self._next_reacq_ms = (epoch_ms0
                                               + self.reacq_period_ms)
                        active = [i for i, s in enumerate(self.slots)
                                  if s.state is not SlotState.IDLE]
                    if not active:
                        self._cursor += k * espc
                        self._watchdog()
                        e += k
                        self._clock_epochs = e   # nothing in flight
                        continue
                    entry = True
                entry_rel = None
                if entry:
                    base = int(min(self._abs_pos[i] for i in active))
                    if self.wire is not None:
                        from gnsstpu.ops.unpack import align
                        base -= base % align(self.wire)
                    rel = np.round(self._abs_pos - base).astype(np.int64)
                    for i in list(active):
                        if rel[i] > self._drift_margin:
                            self._drop(i, epoch_ms0,
                                       why="window_overrun")
                            self._abs_pos[i] = base
                            rel[i] = 0
                            active.remove(i)
                    if not active:
                        self._cursor = base + k * espc
                        continue
                    for i, s in enumerate(self.slots):
                        if s.state is SlotState.IDLE:
                            self._abs_pos[i] = base
                            rel[i] = 0
                    entry_rel = rel
                    self._pending_allocs = []
                    self._cursor = base
                    nxt = None
                    entry = False
                base = self._cursor
                try:
                    if nxt is not None:
                        chunk = nxt.result()
                        nxt = None
                        if chunk.base != base or chunk.k < k:
                            chunk = self._prefetch_chunk(base, k)
                    else:
                        chunk = self._prefetch_chunk(base, k)
                except TimeoutError:
                    nxt = None
                    if self._recover_stall(epoch_ms0):
                        entry = True
                        continue
                    raise
                if chunk.ended:
                    self.tlm.event(epoch_ms0, "end_of_data")
                    break
                # sample_pos retarget for this dispatch: entry rebases
                # every row from the host bookkeeping; steady state
                # shifts the carried rows by the base-track delta and
                # rewrites freshly allocated rows.
                C = self.cfg.n_channels
                if entry_rel is not None:
                    delta = 0
                    mask = np.ones(C, bool)
                    newsp = entry_rel
                    # Host bookkeeping must carry the SAME rounded
                    # positions the device correlates at, or every
                    # pseudorange inherits the rounding residue.
                    self._abs_pos = base + entry_rel.astype(np.float64)
                else:
                    delta = self._det_base - base
                    mask = np.zeros(C, bool)
                    newsp = np.zeros(C, np.int64)
                    for i in self._pending_allocs:
                        sp_i = round(self._abs_pos[i] - base)
                        mask[i] = True
                        newsp[i] = sp_i
                        self._abs_pos[i] = base + sp_i
                    self._pending_allocs = []
                cur = self._dispatch_superepoch(chunk, k, e, delta,
                                                mask, newsp)
                cur.fetch = fx.submit(self._materialize, cur)
                self._det_base = base + k * espc
                k_next = min(self.sync_every, n_epochs - e - k)
                if k_next > 0:
                    la = 1 if entry_rel is not None else 2
                    nbase = self._next_base(active, la, k,
                                            self._det_base)
                    self._cursor = nbase
                    nxt = ex.submit(self._prefetch_chunk, nbase, k_next)
                else:
                    self._cursor = self._det_base
                if pend is not None:
                    self._harvest(pend, next_base=self._cursor,
                                  alloc_ms=(e + k) * self.epoch_ms,
                                  k_ahead=k)
                    # Clock commits at HARVEST (when records/telemetry
                    # for those epochs are actually emitted), so an
                    # exception mid-pipeline never leaves emitted
                    # labels ahead of the clock (see run()).
                    self._clock_epochs = e
                pend = cur
                e += k
            if pend is not None:
                self._harvest(pend, next_base=self._cursor,
                              alloc_ms=e * self.epoch_ms)
            self._clock_epochs = e
        finally:
            ex.shutdown(wait=False)
            fx.shutdown(wait=False)

    def _harvest(self, p: _Inflight, next_base: int,
                 alloc_ms: int, k_ahead: int = 0) -> None:
        """Supervise a completed superepoch (its readback has been in
        flight since dispatch); drops/reacquisition placements recorded
        here take effect at the next dispatch (chunk base next_base,
        first epoch alloc_ms). k_ahead: epochs of the superepoch
        currently in flight (0 when draining — no further dispatch, so
        no window check)."""
        epoch_ms0 = p.e0 * self.epoch_ms
        t0 = time.perf_counter()
        if p.fetch is not None:
            (streams_k, stats_k), acq = p.fetch.result()
        else:
            packed_np = jax.tree.map(np.asarray, p.packed)
            acq = (jax.tree.map(np.asarray, p.acq_fut)
                   if p.acq_fut is not None else None)
            streams_k, stats_k = self._decode_readback(packed_np)
        t1 = time.perf_counter()
        self.tlm.task_health(epoch_ms0, "track", p.t_disp,
                             engine=self.engine, n_active=p.n_active,
                             sync_every=p.k)
        self.tlm.task_health(epoch_ms0, "upload", p.t_up,
                             wire=self.wire or "array",
                             read_s=round(p.t_read, 4))
        self.tlm.task_health(epoch_ms0, "readback", t1 - t0)
        if hasattr(self.source, "stats"):
            self.tlm.task_health(epoch_ms0, "source", 0.0,
                                 **self.source.stats())
        self._chunk_cache = (p.base, p.buf)
        # Slots allocated since this superepoch was dispatched start
        # tracking only at the NEXT one: keep their fresh positions out
        # of (and safe from) this superepoch's bookkeeping.
        last_ms = (p.e0 + p.k - 1) * self.epoch_ms
        fresh = {i: self._abs_pos[i]
                 for i, s in enumerate(self.slots)
                 if s.state is not SlotState.IDLE
                 and s.started_ms > last_ms}
        pos = self._abs_pos.copy()
        for i, s in enumerate(self.slots):
            if s.state is SlotState.IDLE:
                pos[i] = p.base
        self._alloc_log = []
        pos = self._supervise_block(streams_k, stats_k, pos, p.e0)
        self._abs_pos = pos
        for i, v in fresh.items():
            self._abs_pos[i] = v
        self._last_progress = time.monotonic()
        self.tlm.task_health(epoch_ms0, "assess",
                             time.perf_counter() - t1)
        if acq is not None:
            self._finish_chunk_acq(acq, p.acq_want, p.acq_base, alloc_ms,
                                   head=next_base)
        elif p.acq_host:
            t2 = time.perf_counter()
            self._try_acquire(alloc_ms)
            self.tlm.task_health(alloc_ms, "acquire",
                                 time.perf_counter() - t2)
        allocs = list(self._alloc_log)
        self._alloc_log = None
        self._pending_allocs.extend(allocs)
        # Window budget vs the NEXT dispatch base: a drifted-out channel
        # is re-anchored via re-acquisition (lands one superepoch late —
        # the margin budgets the lag). _abs_pos is one superepoch behind
        # the next dispatch, so predict forward by the in-flight
        # superepoch's advance before comparing.
        if k_ahead > 0:
            adv = k_ahead * self._espc
            for i, s in enumerate(self.slots):
                if (s.state is SlotState.IDLE or i in allocs
                        or s.started_ms > last_ms):
                    continue
                relp = self._abs_pos[i] + adv - next_base
                if relp < 0 or relp > self._drift_margin:
                    self._drop(i, alloc_ms, why="window_overrun")

    def _supervise_block(self, streams_k, stats_k, pos, e0: int):
        """Host supervision for K epochs of canonical stream/stat
        arrays (shared by the serial superepoch and the prefetch
        harvest); returns the advanced per-slot positions."""
        for j in range(len(stats_k)):
            epoch_ms = (e0 + j) * self.epoch_ms
            st = stats_k[j]
            sj = streams_k[j]
            blk = sj[:, :, self._S_BLK].astype(np.float64)
            ends = pos[None, :] + np.cumsum(blk, axis=0)
            status = tlock.LockStatus(
                cn0_dbhz=st[:, self._T_CN0],
                pll_lock=st[:, self._T_PLL],
                code_lock=st[:, self._T_CODE],
                locked=st[:, self._T_LOCKED] > 0.5)
            dopp_full = sj[:, :, self._S_DOPP]
            self._supervise_epoch(
                epoch_ms, status,
                ip=sj[:, :, self._S_IP], qp=sj[:, :, self._S_QP],
                rem=sj[:, :, self._S_REM], ends=ends,
                dopp_last=dopp_full[-1], dopp_full=dopp_full,
                streams=sj)
            pos = ends[-1]
        return pos

    def _supervise_epoch(self, epoch_ms: int, status, *, ip, qp, rem,
                         ends, dopp_last, dopp_full,
                         streams=None) -> None:
        """Per-epoch host supervision: records, history, confirm/drop
        state machine, navigator poll. Arrays are [E, C] (np)."""
        # A slot allocated AFTER this (in-flight) superepoch was
        # dispatched starts tracking later: its device row here is
        # pre-handoff garbage, so the record must not label it with the
        # new PRN (same guard as the history appends below).
        rec = EpochRecord(
            epoch_ms=epoch_ms,
            prn=np.array([0 if s.started_ms > epoch_ms else s.prn
                          for s in self.slots]),
            cn0_dbhz=np.asarray(status.cn0_dbhz),
            pll_lock=np.asarray(status.pll_lock),
            doppler_hz=np.asarray(dopp_last))
        self.records.append(rec)

        abs_samp = (ends - rem.astype(np.float64)
                    * self.eng.rem_to_samples)
        active = [i for i, s in enumerate(self.slots)
                  if s.state is not SlotState.IDLE]
        for i in active:
            s = self.slots[i]
            if s.started_ms > epoch_ms:
                # Pipelined mode: the slot was allocated after this
                # (in-flight) superepoch was dispatched — it starts
                # tracking at a later epoch, so this superepoch's slot
                # row is pre-handoff garbage; keep it out of history.
                continue
            h = self.history[s.prn]
            h["i_p"].append(ip[:, i].copy())
            h["q_p"].append(qp[:, i].copy())
            if self.eng.has_data_component and streams is not None:
                h["i_p2"].append(streams[:, i, self._S_IP2].copy())
                h["q_p2"].append(streams[:, i, self._S_QP2].copy())
            h["carr_doppler"].append(dopp_full[:, i].copy())
            h["abs_sample"].append(abs_samp[:, i].copy())
            if streams is not None and "_cph" in h:
                h["carr_cycles"].append(h["_cph"].update(
                    dopp_full[:, i], streams[:, i, self._S_BLK]))
            self.tlm.channel_health(
                epoch_ms, i, s.prn, s.state.value,
                float(status.cn0_dbhz[i]), float(dopp_last[i]),
                float(status.pll_lock[i]),
                ip_abs=round(float(np.mean(np.abs(ip[:, i]))), 1),
                qp_abs=round(float(np.mean(np.abs(qp[:, i]))), 1))
            if s.started_ms + self.epoch_ms >= epoch_ms:
                continue          # grace epoch while loops pull in
            if s.state is SlotState.CONFIRM:
                s.confirm_seen += 1
                if status.locked[i]:
                    s.confirm_good += 1
                if s.confirm_good >= self.confirm_m:
                    s.state = SlotState.TRACKING
                    self.tlm.event(epoch_ms, "channel_confirmed",
                                   chan=i, prn=s.prn)
                elif s.confirm_seen >= self.confirm_epochs:
                    self._drop(i, epoch_ms, why="confirm_failed")
                continue
            if not status.locked[i]:
                s.bad_epochs += 1
                if s.bad_epochs >= self.drop_after:
                    self._drop(i, epoch_ms, why="loss_of_lock")
            else:
                s.bad_epochs = 0

        if self.navigator is not None:
            t0 = time.perf_counter()
            self.navigator.poll(self, epoch_ms)
            self.tlm.task_health(epoch_ms, "pvt",
                                 time.perf_counter() - t0)
        self._trim_history()

    _HIST_LANES = ("i_p", "q_p", "carr_doppler", "abs_sample",
                   "carr_cycles", "i_p2", "q_p2")

    def _trim_history(self) -> None:
        """Evict per-PRN prompt history (whole epoch chunks) and epoch
        records older than history_window_ms; h['evicted'] counts the
        dropped code periods so consumers keep absolute indexing."""
        if self.history_window_ms is None:
            return
        wb = self.history_window_ms // self.eng.period_ms
        for s in self.slots:
            h = self.history.get(s.prn) if s.prn else None
            if h is None or not h["i_p"]:
                continue
            total = sum(len(a) for a in h["i_p"])
            while h["i_p"] and total - len(h["i_p"][0]) >= wb:
                n0 = len(h["i_p"][0])
                for k in self._HIST_LANES:
                    if h.get(k):
                        h[k].pop(0)
                h["evicted"] += n0
                total -= n0
        max_rec = max(1, self.history_window_ms // self.epoch_ms)
        if len(self.records) > max_rec:
            del self.records[: len(self.records) - max_rec]

    def _apply_commands(self, epoch_ms: int) -> None:
        """Commando equivalent: apply JSON-line runtime commands at the
        epoch boundary (reference executes GUI-pipe commands between
        correlator updates, objects/commando.cpp)."""
        settable = {"reacq_period_ms": "reacq_period_ms",
                    "cn0_drop": "cn0_drop", "drop_after": "drop_after",
                    "stall_timeout_s": "stall_timeout_s"}
        for c in self.commands.poll():
            cmd = c.get("cmd")
            if cmd == "stop":
                self._stop = True
            elif cmd == "drop":
                # Any non-IDLE slot (CONFIRM probation included) can be
                # commanded off — a masked/dropped PRN must not survive in
                # probation and graduate to TRACKING afterwards.
                for i, s in enumerate(self.slots):
                    if s.state is not SlotState.IDLE \
                            and s.prn == c.get("prn"):
                        self._drop(i, epoch_ms, why="commanded")
            elif cmd == "mask":
                if c.get("prn") in self.pool:
                    self.pool.remove(c["prn"])
                for i, s in enumerate(self.slots):
                    if s.state is not SlotState.IDLE \
                            and s.prn == c.get("prn"):
                        self._drop(i, epoch_ms, why="masked")
            elif cmd == "unmask":
                if c.get("prn") not in self.pool:
                    self.pool.append(c["prn"])
            elif cmd == "set" and c.get("key") in settable:
                # Remote commands are untrusted console input: a bad
                # value must be rejected here, not crash the receiver
                # loop epochs later (the reference NAKs malformed
                # commands over the pipe, commando.cpp).
                v = c.get("v")
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    self.tlm.event(epoch_ms, "command_rejected",
                                   raw=str(c)[:80])
                    continue
                key = settable[c["key"]]
                setattr(self, key,
                        int(v) if key == "drop_after" else float(v))
            else:
                self.tlm.event(epoch_ms, "command_rejected", raw=str(c)[:80])
                continue
            self.tlm.event(epoch_ms, "command_ok", raw=str(c)[:80])

    def _watchdog(self) -> None:
        """Patience equivalent: a live source that stops producing for
        stall_timeout_s is restarted (recoverable sources) or raises."""
        if time.monotonic() - self._last_progress > self.stall_timeout_s:
            if self._recover_stall(-1):
                return
            self.tlm.event(-1, "watchdog_stall")
            raise TimeoutError(
                f"sample source stalled > {self.stall_timeout_s}s")

    def _recover_stall(self, epoch_ms: int) -> bool:
        """Patience-thread recovery (reference patience.cpp:80-104
        Stop -> ResetSource -> Start): restart the producer through the
        source's restart hook, re-anchor every channel at the stream
        head for re-acquisition, and continue the run. False = source
        not restartable or restarts keep failing (caller re-raises)."""
        src = self.source
        if not getattr(src, "can_restart", False):
            return False
        self._consec_restarts += 1
        if self._consec_restarts > 3:
            return False
        self.tlm.event(epoch_ms, "watchdog_restart",
                       attempt=self._consec_restarts)
        src.restart()
        for i, s in enumerate(self.slots):
            if s.state is not SlotState.IDLE:
                self._drop(i, epoch_ms, why="watchdog_restart")
        head = (int(src.position()) if hasattr(src, "position")
                else self._cursor)
        if self.wire is not None:
            from gnsstpu.ops.unpack import align
            head -= head % align(self.wire)
        self._cursor = max(self._cursor, head)
        self._abs_pos[:] = self._cursor
        self._next_reacq_ms = max(0, epoch_ms)
        self._last_progress = time.monotonic()
        return True

    # --- checkpoint / warm restart ---

    def save_checkpoint(self, path: str) -> None:
        """Persist the live channel bank: slot assignments, device
        tracking state, and stream positions — the reference's
        skipAcquisition role (initSettings.sci:77, trackingResults.dat
        autosave) at the live-runtime level."""
        from gnsstpu.runtime import checkpoint

        # Carrier-phase continuity (reference: Measurement_M cycle
        # counts survive the delayed measurement buffer for
        # differencing, objects/correlator.cpp:263-357): persist each
        # live slot's integer NCO-mirror accumulator so integrated
        # carrier phase — and the absolute block index (evicted +
        # appended blocks) — continue across the restart. acc can
        # exceed int64 on long runs (it is an exact Python int), so it
        # ships as a decimal string in the JSON meta.
        cph = {}
        for s in self.slots:
            if s.state is SlotState.IDLE or s.prn not in self.history:
                continue
            h = self.history[s.prn]
            a = h.get("_cph")
            if a is None:
                continue
            cph[str(s.prn)] = {
                "acc": str(a.acc),
                "last_delta": float(a.last_delta),
                "base": int(a.base),
                "blocks_seen": int(h.get("evicted", 0))
                + sum(len(x) for x in h["i_p"]),
            }
        checkpoint.save(
            path,
            state=jax.tree.map(np.asarray, self._state),
            meta={
                "signal": self.sig.signal,
                "epoch_ms": self.epoch_ms,
                "slots": [[s.state.value, s.prn, s.started_ms]
                          for s in self.slots],
                "abs_pos": [float(v) for v in self._abs_pos],
                "cursor": int(self._cursor),
                "cph": cph,
            })

    def restore_checkpoint(self, path: str) -> dict:
        """Warm-restart from a saved channel bank: slots resume
        TRACKING at their saved code phases with no re-acquisition.
        Carrier-phase accumulators are restored too, so integrated
        carrier phase (and the absolute block index via h['evicted'])
        is CONTINUOUS across the restart — phase_u32 stays bit-exact
        vs an uninterrupted run (tests/test_runtime.py). Call before
        run(); the source must serve the saved stream positions."""
        from gnsstpu.runtime import checkpoint

        state, meta, _, _ = checkpoint.load(path)
        if meta.get("signal") != self.sig.signal:
            raise ValueError(
                f"checkpoint is for signal {meta.get('signal')!r}")
        # _put_dev keeps the mesh placement __init__ established — a
        # warm-restarted ChannelManager(mesh=...) resumes SHARDED.
        self._state = jax.tree.map(self._put_dev, state)
        self._abs_pos = np.asarray(meta["abs_pos"], np.float64)
        self._cursor = int(meta["cursor"])
        for i, (st, prn, _started) in enumerate(meta["slots"]):
            s = self.slots[i]
            s.state = SlotState(st)
            s.prn = int(prn)
            s.bad_epochs = 0
            # Epoch labels restart at 0 in the resumed run.
            s.started_ms = 0
            if s.state is SlotState.IDLE or not s.prn:
                continue
            # Rebuild the slot's code tables / consts and a fresh
            # history (the stream restarts at the resume point; the
            # saved accumulator + blocks_seen keep carrier phase and
            # the absolute block index continuous across the gap).
            self.eng.write_slot(self._bank, i, s.prn)
            dopp0 = float(np.asarray(
                self._state.corr.carr_delta[i])) if hasattr(
                    self._state.corr, "carr_delta") else 0.0
            saved = (meta.get("cph") or {}).get(str(s.prn))
            hist = self._new_history(
                i, start_ms=0,
                doppler_hz=saved["last_delta"] if saved else dopp0,
                evicted=int(saved["blocks_seen"]) if saved else 0)
            if saved:
                hist["_cph"].acc = int(saved["acc"])
                hist["_cph"].base = int(saved["base"])
            self.history[s.prn] = hist
        self._bank_dev = None      # re-upload the rebuilt bank
        return meta

    # --- history accessors ---

    def prompt_stream(self, prn: int) -> dict:
        """Concatenated per-PRN prompt history (np arrays)."""
        h = self.history[prn]
        return {k: (np.concatenate(v) if isinstance(v, list) else v)
                for k, v in h.items() if not k.startswith("_")}
