"""Channel-sharded fused tracking: shard_map around the Pallas kernel.

The fused kernel (ops.track_kernel) is a single-core program; multi-chip
channel parallelism (the DP slot of SURVEY.md §2.8) wraps it in shard_map
over the mesh's "channel" axis — every device runs the identical kernel on
its own channel shard with the sample chunk replicated, zero collectives
in steady state (channels are independent; the reference's analogue is
12 hardware channels ticking concurrently, namuru
gps_baseband_16bit_async_mem_bus.v:464+).

This is the multi-chip form of the PRODUCTION engine: the same
pallas_call the bench measures, not the scan fallback.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnsstpu.config import SignalConfig, TrackConfig
from gnsstpu.tracking.fused import make_fused_tracker
from gnsstpu.tracking.scan import TrackOut, TrackState


def shard_fused_inputs(state: TrackState, tab, consts, chunk, mesh: Mesh,
                       axis: str = "channel"):
    """Place fused-tracker inputs: state pytree [C]-leaves and the code
    table [C, R, blkp] sharded over `axis`, chunk replicated."""
    s_c = NamedSharding(mesh, P(axis))
    state = jax.tree.map(lambda x: jax.device_put(x, s_c), state)
    tab = jax.device_put(tab, NamedSharding(mesh, P(axis, None, None)))
    consts = tuple(jax.device_put(c, s_c) for c in consts)
    chunk = jax.device_put(chunk, NamedSharding(mesh, P()))
    return state, tab, consts, chunk


def make_sharded_fused_tracker(sig: SignalConfig, trk: TrackConfig, *,
                               mesh: Mesh, n_blocks: int,
                               axis: str = "channel",
                               ct: int = 8,
                               interpret: bool | None = None):
    """Build track_chunk(chunk, tab, consts, state) running the fused
    Pallas kernel on every device of mesh[axis] over its channel shard.

    The per-shard channel count is C / mesh.shape[axis]; C must divide
    evenly (pad the slot bank, as ChannelManager does, if not).
    interpret=None derives the mode from the mesh's devices (compiled on
    TPU meshes, interpreter on virtual CPU validation meshes).
    """
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    inner = make_fused_tracker(sig, trk, n_blocks=n_blocks, ct=ct,
                               interpret=interpret)

    state_spec = TrackState(
        corr=jax.tree.map(lambda _: P(axis), TrackState.init(
            np.zeros(1, np.int64), np.zeros(1, np.float32)).corr),
        doppler_basis=P(axis), carr_nco=P(axis), old_carr_err=P(axis),
        code_nco=P(axis), old_code_err=P(axis), ip_prev=P(axis),
        qp_prev=P(axis))
    out_spec = jax.tree.map(lambda _: P(None, axis), TrackOut(
        *([0] * len(TrackOut._fields))))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None), (P(axis), P(axis)), state_spec),
        out_specs=(state_spec, out_spec),
        check_vma=False,
    )
    def _sharded(chunk, tab, consts, state):
        return inner(chunk, tab, consts, state)

    @jax.jit
    def track_chunk(chunk, tab, consts, state):
        return _sharded(chunk, tab, consts, state)

    return track_chunk
