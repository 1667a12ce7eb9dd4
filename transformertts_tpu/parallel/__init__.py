from transformertts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_spec,
    shard_batch,
    shard_state,
    state_shardings,
)
