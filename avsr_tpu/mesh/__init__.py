from avsr_tpu.mesh.sharding import (  # noqa: F401
    batch_sharder,
    build_mesh,
    param_spec,
    param_specs,
    shard_params,
    shard_state,
    shard_train_step,
)
