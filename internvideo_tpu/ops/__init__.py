from internvideo_tpu.ops.attention import dot_product_attention
from internvideo_tpu.ops.rmsnorm import rms_norm
