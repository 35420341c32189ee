from gnsstpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_acquisition_inputs,
    shard_channel_state,
)
