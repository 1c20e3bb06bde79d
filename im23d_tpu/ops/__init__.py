"""Pure-functional compute ops (XLA + Pallas).

Every op here is shape-static, jit-safe and differentiable unless noted.
"""

from im23d_tpu.ops.quaternion import (
    qadd,
    qsub,
    qsquare,
    qmul,
    qconj,
    qnormalize,
    qrot,
    qrot_points,
    quaternion_angle_loss,
    blender_camera_to_quaternion,
)
from im23d_tpu.ops.camera import world_to_camera
from im23d_tpu.ops.voxel import (
    trilinear_splat,
    gaussian_kernel_1d,
    gaussian_blur_3d,
    termination_probs,
    project_silhouette,
    point_cloud_to_silhouette,
)
from im23d_tpu.ops.sampling import (
    grid_sample_bilinear,
    circpad,
    symmetrize_texture,
    adjust_poles,
    resize_bilinear_half,
)
from im23d_tpu.ops.pointcloud import (
    keep_mask,
    repeat_interleave_batch,
)

__all__ = [
    "qadd",
    "qsub",
    "qsquare",
    "qmul",
    "qconj",
    "qnormalize",
    "qrot",
    "qrot_points",
    "quaternion_angle_loss",
    "blender_camera_to_quaternion",
    "world_to_camera",
    "trilinear_splat",
    "gaussian_kernel_1d",
    "gaussian_blur_3d",
    "termination_probs",
    "project_silhouette",
    "point_cloud_to_silhouette",
    "grid_sample_bilinear",
    "circpad",
    "symmetrize_texture",
    "adjust_poles",
    "resize_bilinear_half",
    "keep_mask",
    "repeat_interleave_batch",
]
