from audio8_tpu.parallel.sharding import (
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
    shard_params,
    DP_ONLY_RULES,
    TP_RULES,
)
