from gnsstpu.parallel.mesh import (  # noqa: F401
    make_distributed_mesh,
    make_mesh,
    shard_acquisition_inputs,
    shard_channel_state,
)
from gnsstpu.parallel.fused_shard import (  # noqa: F401
    make_sharded_fused_tracker,
    shard_fused_inputs,
)
