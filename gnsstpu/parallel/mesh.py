"""Device-mesh sharding for the receiver's two big parallel axes.

The reference parallelizes with 10 pthreads + SIMD on one box
(SURVEY.md §2.8); the TPU framework instead shards over a jax mesh:

  * "channel" axis — tracking channels (SVs) are embarrassingly parallel
    (DP-analogue): state pytree leaves and code tables shard on their
    leading [C] dim; the sample chunk is replicated; zero collectives in
    the steady-state scan.
  * "doppler" axis — acquisition's (PRN x Doppler x code-phase) search
    cube shards over Doppler bins and PRNs (TP-analogue); XLA inserts the
    argmax/max collectives for peak_metrics automatically.

Everything goes through jit + NamedSharding (GSPMD): we annotate inputs,
XLA partitions the program and places collectives on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh, e.g. make_mesh([("channel", 2), ("doppler", 4)])."""
    names = tuple(n for n, _ in axis_sizes)
    shape = tuple(s for _, s in axis_sizes)
    n = int(np.prod(shape))
    if devices is None:
        devices = list(jax.devices())
        if len(devices) < n:
            # Default platform too small (e.g. a single real TPU chip while
            # dry-running an N-device sharding): fall back to the host CPU
            # backend, which exposes xla_force_host_platform_device_count
            # virtual devices for sharding validation.
            try:
                cpu = list(jax.devices("cpu"))
            except RuntimeError:
                cpu = []
            if len(cpu) >= n:
                import warnings
                warnings.warn(
                    f"make_mesh: default platform has {len(devices)} "
                    f"device(s) but the mesh needs {n}; falling back to "
                    "host-CPU virtual devices (sharding-validation mode, "
                    "NOT accelerator execution)", RuntimeWarning,
                    stacklevel=2)
                devices = cpu
    devices = list(devices)[:n]
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(shape), names)


def make_distributed_mesh(axis_sizes: Sequence[Tuple[str, int]],
                          coordinator: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> Mesh:
    """Multi-host mesh over DCN: initialize jax.distributed (one call
    per host process, same coordinator address everywhere), then build
    the global mesh over every process's devices. Collectives whose
    mesh axis spans hosts ride DCN; axes within one host stay on ICI —
    lay out the high-traffic axis (channel) innermost so it stays
    host-local. On a single-host rig this degrades to make_mesh.

    SURVEY §2.8 slot 5 (the reference has no multi-box story at all;
    this is the TPU-native equivalent of scaling past one host).
    Untestable beyond API shape on a single-host rig — exercised as a
    passthrough there.
    """
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return make_mesh(axis_sizes)


def shard_channel_state(state, codes, mesh: Mesh, axis: str = "channel"):
    """Place tracking state ([C]-leaved pytree) + code table [C, L+2] with
    the channel dim sharded over `axis`; C must divide by the axis size."""
    s_state = NamedSharding(mesh, P(axis))
    state = jax.tree.map(lambda x: jax.device_put(x, s_state), state)
    codes = jax.device_put(codes, NamedSharding(mesh, P(axis, None)))
    return state, codes


def shard_acquisition_inputs(blocks_iq, code_fd_re, code_fd_im, doppler,
                             mesh: Mesh, prn_axis: str = "channel",
                             doppler_axis: str = "doppler"):
    """Place acquisition inputs: sample windows replicated, code replicas
    sharded over PRNs, Doppler grid sharded over bins."""
    blocks_iq = jax.device_put(blocks_iq, NamedSharding(mesh, P()))
    prn_sh = NamedSharding(mesh, P(prn_axis, None))
    code_fd_re = jax.device_put(code_fd_re, prn_sh)
    code_fd_im = jax.device_put(code_fd_im, prn_sh)
    doppler = jax.device_put(
        doppler, NamedSharding(mesh, P(doppler_axis)))
    return blocks_iq, code_fd_re, code_fd_im, doppler
