"""IoU metrics: 2D silhouette mIoU and voxelized 3D IoU.

``mean_iou`` matches the reference (``code/run_reconstruction.py:225-231``):
binarize alpha at 0.5, per-sample IoU, mean over the batch.
``iou_3d`` voxelizes point clouds with the splat pipeline (new capability —
BASELINE requires a 3D evaluator the reference lacks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from im23d_tpu.ops.voxel import trilinear_splat


def mean_iou(alpha_pred: jnp.ndarray, alpha_real: jnp.ndarray,
             per_sample: bool = False) -> jnp.ndarray:
    """(B, H, W) predicted/real alphas -> mean IoU (or per-sample (B,))."""
    p = alpha_pred > 0.5
    r = alpha_real > 0.5
    inter = jnp.sum((p & r).astype(jnp.float32), axis=(1, 2))
    union = jnp.sum((p | r).astype(jnp.float32), axis=(1, 2))
    iou = inter / jnp.maximum(union, 1.0)
    return iou if per_sample else jnp.mean(iou)


def iou_3d(points_a: jnp.ndarray, points_b: jnp.ndarray, voxel_size: int = 32,
           threshold: float = 0.1) -> jnp.ndarray:
    """Occupancy IoU of two point clouds on a shared voxel grid.

    Both clouds are splatted to (voxel_size)^3 occupancies and binarized.
    Returns (B,) per-pair IoU.
    """
    va = trilinear_splat(points_a, voxel_size) > threshold
    vb = trilinear_splat(points_b, voxel_size) > threshold
    inter = jnp.sum((va & vb).astype(jnp.float32), axis=(1, 2, 3))
    union = jnp.sum((va | vb).astype(jnp.float32), axis=(1, 2, 3))
    return inter / jnp.maximum(union, 1.0)
