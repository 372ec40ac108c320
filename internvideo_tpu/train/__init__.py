from internvideo_tpu.train.optim import (
    build_optimizer,
    cosine_schedule,
    OptimizerConfig,
)
from internvideo_tpu.train.state import TrainState, create_sharded_state
