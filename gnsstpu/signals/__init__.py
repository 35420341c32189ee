"""Signal definitions: ranging-code generators and constellation metadata.

Each module exposes pure NumPy code generators returning ±1 int8 chip arrays.
Codes are generated once on the host and cached; device kernels consume
resampled code tables (see gnsstpu.ops.code_tables).
"""

from gnsstpu.signals.registry import get_signal, SignalDef  # noqa: F401
