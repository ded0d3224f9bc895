"""Differentiable surface-splatting rendering stack.

Parity map: DSS/core/{rasterizer,renderer,texture,lighting}.py +
DSS/csrc CUDA kernels -> TPU-native tiled gather rasterizer with
custom_vjp DSS occupancy gradients (SURVEY.md §2.1, §3.3).
"""

from isopoints_tpu.rendering.rasterizer import (
    Fragments,
    RasterizationSettings,
    SplatParams,
    compute_splat_params,
    rasterize_splats,
    visible_point_mask,
)
from isopoints_tpu.rendering.compositor import (
    norm_weighted_sum_composite,
    weighted_sum_composite,
)
from isopoints_tpu.rendering.lighting import (
    DirectionalLights,
    PointLights,
    apply_lighting,
    diffuse,
    specular,
)
from isopoints_tpu.rendering.texture import lighting_texture, neural_texture
from isopoints_tpu.rendering.renderer import RenderOutput, render_pointcloud
