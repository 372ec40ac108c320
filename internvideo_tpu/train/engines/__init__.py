from internvideo_tpu.train.engines.pretrain import (
    UMTPretrainConfig,
    make_pretrain_step,
)
