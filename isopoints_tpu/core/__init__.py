from isopoints_tpu.core.cloud import PointCloud, PointCloudFilters
from isopoints_tpu.core.camera import (
    PerspectiveCamera,
    CameraSampler,
    look_at_rotation,
    look_at_view_transform,
)
