from fbbev_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d  # noqa: F401
from fbbev_tpu.ops.bev_pool import bev_pool, lss_voxel_pool  # noqa: F401
from fbbev_tpu.ops.deform_attn import (  # noqa: F401
    multi_scale_deformable_attention,
    msda_sample,
)
