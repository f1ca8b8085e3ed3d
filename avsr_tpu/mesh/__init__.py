from avsr_tpu.mesh.sharding import (  # noqa: F401
    batch_sharder,
    build_mesh,
    param_spec,
    param_specs,
    shard_params,
    shard_state,
    shard_train_step,
)
from avsr_tpu.mesh.multihost import (  # noqa: F401
    local_rows,
    multihost_batch_sharder,
    multihost_infer_batch_sharder,
    process_shard,
    put_global,
)
