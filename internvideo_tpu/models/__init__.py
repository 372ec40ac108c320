from internvideo_tpu.models.internvideo2 import (
    InternVideo2,
    InternVideo2Config,
    INTERNVIDEO2_SIZES,
)
