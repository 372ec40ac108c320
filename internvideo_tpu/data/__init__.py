from internvideo_tpu.data.masking import (
    attention_guided_keep_indices,
    random_keep_indices,
    tube_keep_indices,
)
