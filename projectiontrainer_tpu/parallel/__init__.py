from projectiontrainer_tpu.parallel.sharding import (
    param_shardings,
    shard_params,
    shard_batch,
    local_nbytes,
    DEFAULT_RULES,
)
