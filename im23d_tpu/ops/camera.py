"""Camera-space transform for the rendering-free projection pipeline.

Parity target: ``CameraUtilities.transformation_3d_coord_to_camera_coord``
(``code/camera/coordinate_system_transformation.py:20-39``).

Coordinate convention (inherited from the reference / Insafutdinov &
Dosovitskiy): point clouds are (..., N, 3) with component order
``(z, y, x)`` — component 0 is depth along the view ray. After quaternion
rotation, the lateral components (y, x) are perspective-divided by
``z + camera_distance`` scaled by the field-of-view factor.
"""

from __future__ import annotations

import jax.numpy as jnp

from im23d_tpu.ops.quaternion import qrot_points

FIELD_OF_VIEW = 1.875
CAMERA_DISTANCE = 2.0


def world_to_camera_zyx(
    point_cloud: jnp.ndarray,
    rotation: jnp.ndarray,
    field_of_view: float = FIELD_OF_VIEW,
    camera_distance: float = CAMERA_DISTANCE,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``world_to_camera`` returning the (z, y, x) component planes.

    Planar (..., N) outputs keep the camera transform in lane-friendly
    layouts all the way into the projection kernels — no interleaved
    (N, 3) stack that consumers immediately re-slice.  (The stack+slice
    roundtrip also triggered an XLA:TPU fusion miscompilation at candidate
    -sweep scale: the strided slice read the broadcast cam buffer with a
    collapsed row stride, silently corrupting gz for every row > 0; see
    tests/test_splat_pallas.py::test_candidate_sweep_in_jit_matches_eager.)
    """
    pc = qrot_points(point_cloud, rotation)
    z = pc[..., 0]
    scale = field_of_view / (z + camera_distance)
    return z, pc[..., 1] * scale, pc[..., 2] * scale


def world_to_camera(
    point_cloud: jnp.ndarray,
    rotation: jnp.ndarray,
    field_of_view: float = FIELD_OF_VIEW,
    camera_distance: float = CAMERA_DISTANCE,
) -> jnp.ndarray:
    """Rotate a (z,y,x) point cloud into camera space + perspective divide.

    Args:
      point_cloud: (..., N, 3) points, components (z, y, x).
      rotation: (..., 4) wxyz quaternions (need not be normalized).

    Returns:
      (..., N, 3) camera-space points, components (z, y, x).
    """
    z, y, x = world_to_camera_zyx(
        point_cloud, rotation, field_of_view, camera_distance
    )
    return jnp.stack([z, y, x], axis=-1)
