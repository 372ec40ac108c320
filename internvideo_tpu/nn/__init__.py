from internvideo_tpu.nn.embeds import (
    PatchEmbed3D,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    interpolate_pos_embed,
)
from internvideo_tpu.nn.norms import LayerNorm, RMSNorm
from internvideo_tpu.nn.transformer import (
    Attention,
    AttentionPoolingBlock,
    Block,
    CrossAttention,
    DropPath,
    LayerScale,
    Mlp,
)
