from audio8_tpu.train.optim import (
    create_lrs,
    create_optimizer,
    TrainState,
)
from audio8_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    find_latest_checkpoint,
)
