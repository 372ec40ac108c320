from internvideo_tpu.ops.attention import (
    dot_product_attention,
    fused_qkv_attention_or_none,
    ulysses_context,
)
from internvideo_tpu.ops.rmsnorm import fused_add_rms_norm, rms_norm
from internvideo_tpu.ops.losses import sigmoid_focal_loss, softmax_focal_loss
from internvideo_tpu.ops.quant import QuantDense, int8_matmul, quantize_int8
