"""The rendering-free "effective" projection loss (paper's core contribution).

Pure functions combining the ops pipeline (camera -> splat -> blur ->
termination -> silhouette) with the ensemble-of-pose-predictors min-loss and
the student quaternion-angle loss.

Parity targets: ``EffectiveLossFunction.forward``
(``code/utils/effective_loss_function.py:58-81``) and ``UnsupervisedLoss``
(``code/models/unsupervised_part.py:90-143``, fixing its undefined
``self.num_candidates``).  The reference materializes K*V repeated copies of
every point cloud through a host-visible repeat; here candidates live on an
explicit axis and broadcasting happens inside the rotation, so XLA never
materializes the repeated cloud in HBM before the rotation output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from im23d_tpu.ops.camera import world_to_camera_zyx
from im23d_tpu.ops.quaternion import quaternion_angle_loss
from im23d_tpu.ops.sampling import resize_bilinear
from im23d_tpu.ops.splat_pallas import (
    projection_silhouette_pallas,
    projection_silhouette_products,
    projection_silhouette_reuse,
    trilinear_splat_pallas,
)
from im23d_tpu.ops.voxel import (
    gaussian_blur_3d,
    project_silhouette,
    termination_probs,
    trilinear_splat,
)


_FORCE_PALLAS_PROJECTION = False  # tests: exercise the fused path off-TPU
# (interpret mode)
_DISABLE_WINNER_REUSE = False  # diagnostics: fall back to re-projecting the
# argmin winners with a fresh forward kernel instead of reusing the sweep's
# silhouettes/sorted rows


def _use_pallas_projection() -> bool:
    return _FORCE_PALLAS_PROJECTION or jax.default_backend() == "tpu"


def _splat(points, size, weights):
    """Pallas MXU kernel on TPU, XLA scatter reference elsewhere."""
    if jax.default_backend() == "tpu":
        return trilinear_splat_pallas(points, size, weights=weights)
    return trilinear_splat(points, size, weights=weights)


def _candidate_cam(point_cloud, rotations, scale, weights):
    """Camera-space point planes + repeated weights/scale for C candidates.

    Returns ``((z, y, x), w, sc)`` with each component (B*C, N).  Planar
    components (not a stacked (B*C, N, 3) array) ride into the projection
    kernels: the stack+re-slice roundtrip forced an interleaved layout AND
    triggered an XLA:TPU fusion miscompile at sweep scale (collapsed row
    stride — every row > 0 read garbage gz; caught by the round-3 loss
    investigation, pinned by
    ``tests/test_splat_pallas.py::test_candidate_sweep_in_jit_matches_eager``).
    """
    B, N, _ = point_cloud.shape
    C = rotations.shape[1]
    z, y, x = world_to_camera_zyx(point_cloud[:, None], rotations)  # (B,C,N)
    cam = tuple(g.reshape(B * C, N) for g in (z, y, x))
    w = None
    if weights is not None:
        w = jnp.repeat(weights, C, axis=0)  # (B*C, N), b-major like reshape
    sc = None
    if scale is not None:
        sc = jnp.repeat(scale.reshape(B), C, axis=0)
    return cam, w, sc


def project_candidates(
    point_cloud: jnp.ndarray,
    rotations: jnp.ndarray,
    sigma: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    weights: jnp.ndarray | None = None,
    voxel_size: int = 64,
    kernel_size: int = 21,
) -> jnp.ndarray:
    """Project each cloud under C candidate poses -> (B, C, S, S) silhouettes.

    Args:
      point_cloud: (B, N, 3) in (z, y, x) order.
      rotations: (B, C, 4) wxyz quaternions (C candidate poses per cloud).
      sigma: traced scalar smoothing stddev.
      scale: optional (B,) or (B, 1) occupancy scale per cloud.
      weights: optional (B, N) splat weights (shape-static dropout).
    """
    B, N, _ = point_cloud.shape
    C = rotations.shape[1]
    S = voxel_size

    cam, w, sc = _candidate_cam(point_cloud, rotations, scale, weights)

    if scale is not None and _use_pallas_projection():
        # whole projection as one Pallas kernel: the S^3 grid exists only in
        # VMEM; HBM sees point rows in, (S, S) silhouettes out.  The dropout
        # keep weights are constants, so their cotangent is never needed.
        sil = projection_silhouette_pallas(
            cam, S, sigma, sc, weights=w, kernel_size=kernel_size,
            need_weight_grad=False,
        )
    else:
        vox = _splat(jnp.stack(cam, axis=-1), S, w)
        smooth = gaussian_blur_3d(vox, sigma, kernel_size=kernel_size, scale=sc)
        sil = project_silhouette(termination_probs(smooth))
    return sil.reshape(B, C, S, S)


def _downsample_masks(masks: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear (align_corners) mask resize to the silhouette resolution.

    Parity: ``unsupervised_part.py:108`` (F.interpolate scale 1/2) — the
    silhouette grid is voxel_size = image_size / 2 in every reference config.
    """
    if masks.shape[-1] == size:
        return masks
    return resize_bilinear(masks, size, size, align_corners=True)


def unsupervised_loss(
    outputs: dict,
    masks: jnp.ndarray,
    sigma: jnp.ndarray,
    keep_weights: jnp.ndarray | None,
    num_views: int,
    voxel_size: int = 64,
    student_weight: float = 20.0,
    training: bool = True,
):
    """Ensemble min projection loss + weighted student pose loss.

    Args:
      outputs: dict from ``UnsupervisedPart.__call__`` — point_cloud (B,N,3),
        scale (B,1), ensemble_q (B*V,K,4), student_q (B*V,4).
      masks: (B*V, H, W) ground-truth silhouettes at image resolution.
      sigma: traced scalar smoothing stddev (scheduled).
      keep_weights: (B, N) dropout mask or None.
      training: if False, project only under the student poses and return the
        plain projection loss (``unsupervised_part.py:66-74,110-111``).

    Returns:
      (losses dict, aux dict with ``projection`` and ``min_indexes``).
    """
    cloud = outputs["point_cloud"]
    scale = outputs["scale"]
    B = cloud.shape[0]
    V = num_views
    S = voxel_size

    masks_s = _downsample_masks(masks, S)  # (B*V, S, S)

    if not training:
        student_q = outputs["student_q"].reshape(B, V, 4)
        sil = project_candidates(
            cloud, student_q, sigma, scale=scale, weights=keep_weights,
            voxel_size=S,
        )  # (B, V, S, S)
        sil = sil.reshape(B * V, S, S)
        per_sample = jnp.sum((sil - masks_s) ** 2, axis=(1, 2))
        loss = jnp.sum(per_sample) / (B * V)
        return dict(projection_loss=loss, total_loss=loss), dict(projection=sil)

    ensemble_q = outputs["ensemble_q"]  # (B*V, K, 4)
    student_q = outputs["student_q"]  # (B*V, 4)
    K = ensemble_q.shape[1]

    # The min-over-candidates only backpropagates through the argmin
    # candidate, so the K-way projection runs under stop_gradient (forward
    # only, no residuals) and only the selected candidate is differentiated
    # — identical values and gradients, 1/K the backward work (K*V = 20x
    # fewer clouds in the grad path than the reference's repeat-everything
    # formulation).  On the Pallas path the winners' forward silhouettes and
    # sorted point rows are reused straight from the candidate sweep
    # (projection_silhouette_reuse), so "re-projection" costs only the
    # backward kernel on B*V rows — no second forward, no second sort.
    quats = ensemble_q.reshape(B, V * K, 4)
    use_reuse = (scale is not None and _use_pallas_projection()
                 and not _DISABLE_WINNER_REUSE)
    if use_reuse:
        cam, w, sc = _candidate_cam(
            jax.lax.stop_gradient(cloud),
            jax.lax.stop_gradient(quats),
            jax.lax.stop_gradient(scale),
            keep_weights,
        )
        sil_flat, prods = projection_silhouette_products(
            cam, S, sigma, sc, weights=w
        )  # (B*V*K, S, S)
        sil = sil_flat.reshape(B * V, K, S, S)
    else:
        sil = project_candidates(
            jax.lax.stop_gradient(cloud),
            jax.lax.stop_gradient(quats),
            sigma,
            scale=jax.lax.stop_gradient(scale),
            weights=keep_weights,
            voxel_size=S,
        ).reshape(B * V, K, S, S)

    per_candidate = jnp.sum(
        (sil - masks_s[:, None]) ** 2, axis=(2, 3)
    )  # (B*V, K)
    min_idx = jnp.argmin(per_candidate, axis=-1)  # (B*V,)

    best_q = jnp.take_along_axis(
        ensemble_q, min_idx[:, None, None].repeat(4, axis=-1), axis=1
    )[:, 0]  # (B*V, 4), gradients flow to the selected ensemble head
    cloud_v = jnp.repeat(cloud, V, axis=0)          # (B*V, N, 3)
    scale_v = jnp.repeat(scale.reshape(B), V, axis=0)
    w_v = None if keep_weights is None else jnp.repeat(keep_weights, V, axis=0)
    if use_reuse:
        rows = jnp.arange(B * V, dtype=min_idx.dtype) * K + min_idx
        prods_sel = tuple(a[rows] for a in prods)
        sil_sel_val = jax.lax.stop_gradient(sil_flat[rows])
        cam_sel, w_sel, sc_sel = _candidate_cam(
            cloud_v, best_q[:, None], scale_v, w_v
        )
        sil_sel = projection_silhouette_reuse(
            cam_sel, S, sigma, sc_sel, sil_sel_val, prods_sel, weights=w_sel
        )  # (B*V, S, S)
    else:
        sil_sel = project_candidates(
            cloud_v, best_q[:, None], sigma, scale=scale_v, weights=w_v,
            voxel_size=S,
        )[:, 0]  # (B*V, S, S)
    min_loss = jnp.sum((sil_sel - masks_s) ** 2, axis=(1, 2))
    projection_loss = jnp.sum(min_loss) / (B * V)

    student_loss = jnp.sum(
        quaternion_angle_loss(jax.lax.stop_gradient(best_q), student_q)
    ) / (B * V)

    total = projection_loss + student_weight * student_loss
    losses = dict(
        projection_loss=projection_loss,
        student_loss=student_loss,
        total_loss=total,
    )
    aux = dict(projection=sil, min_indexes=min_idx)
    return losses, aux


def supervised_loss(
    outputs: dict,
    poses: jnp.ndarray,
    masks: jnp.ndarray,
    sigma: jnp.ndarray,
    keep_weights: jnp.ndarray | None,
    num_views: int,
    voxel_size: int = 64,
):
    """Projection MSE under ground-truth poses (SupervisedPart path).

    Parity (intent): ``supervised_part.py:40-72``.
    ``poses``: (B*V, 4) ground-truth view quaternions.
    """
    cloud = outputs["point_cloud"]
    scale = outputs["scale"]
    B = cloud.shape[0]
    V = num_views
    S = voxel_size

    masks_s = _downsample_masks(masks, S)
    sil = project_candidates(
        cloud, poses.reshape(B, V, 4), sigma, scale=scale,
        weights=keep_weights, voxel_size=S,
    ).reshape(B * V, S, S)
    per_sample = jnp.sum((sil - masks_s) ** 2, axis=(1, 2))
    loss = jnp.sum(per_sample) / (B * V)
    return dict(projection_loss=loss, total_loss=loss), dict(projection=sil)
