from internvideo_tpu.core.mesh import (
    MeshConfig,
    create_mesh,
    logical_axis_rules,
    logical_to_sharding,
)
from internvideo_tpu.core.prng import RngStream
