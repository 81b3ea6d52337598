from audio8_tpu.parallel.sharding import (
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
    shard_params,
    shard_state,
    put_batch,
    to_host,
    DP_ONLY_RULES,
    TP_RULES,
)
