from im23d_tpu.models.pointcloud_nets import (
    ConvEncoder,
    PointCloudDecoder,
    PoseDecoder,
    UnsupervisedPart,
    SupervisedPart,
)

__all__ = [
    "ConvEncoder",
    "PointCloudDecoder",
    "PoseDecoder",
    "UnsupervisedPart",
    "SupervisedPart",
]
