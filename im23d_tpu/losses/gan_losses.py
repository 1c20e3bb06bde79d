"""GAN objectives (hinge / ls / original / wgan) with per-critic masking and
weighting, plus the mesh flatness regularizer.

Parity: reference ``GANLoss`` (``code/utils/losses.py:21-120``) and
``loss_flat`` (``losses.py:5-17``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, weight) -> jnp.ndarray:
    w = 1.0 if weight is None else weight
    if mask is None:
        return jnp.mean(x) * w
    per_sample = jnp.sum(x * mask, axis=(1, 2, 3)) / jnp.maximum(
        jnp.sum(mask, axis=(1, 2, 3)), 1e-12
    )
    return jnp.mean(per_sample) * w


def _single_gan_loss(pred, target_is_real: bool, for_discriminator: bool,
                     mask, weight, mode: str) -> jnp.ndarray:
    if mode == "original":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -_masked_mean(jnp.minimum(pred - 1.0, 0.0), mask, weight)
            return -_masked_mean(jnp.minimum(-pred - 1.0, 0.0), mask, weight)
        assert target_is_real, "generator hinge loss aims for real"
        return -_masked_mean(pred, mask, weight)
    if mode == "w":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(mode)


def gan_loss(preds, target_is_real: bool, for_discriminator: bool = True,
             masks=None, weights=None, mode: str = "hinge") -> jnp.ndarray:
    """Multi-critic aggregation (reference ``GANLoss.__call__``): mean over
    critics, or weighted sum / sum(weights) when per-critic weights given."""
    if not isinstance(preds, (list, tuple)):
        return _single_gan_loss(preds, target_is_real, for_discriminator,
                                masks, None, mode)
    total = 0.0
    for i, p in enumerate(preds):
        m = masks[i] if masks is not None else None
        w = weights[i] if weights is not None else None
        total = total + _single_gan_loss(
            p, target_is_real, for_discriminator, m, w, mode
        )
    if weights is None:
        return total / len(preds)
    return total / sum(weights)


def flatness_loss(face_normals: jnp.ndarray, ff: jnp.ndarray,
                  per_sample: bool = False) -> jnp.ndarray:
    """Mean squared cosine distance between edge-adjacent face normals,
    scaled by F/2 (reference ``loss_flat``, ``losses.py:5-17``).

    Args:
      face_normals: (B, F, 3) unit normals.
      ff: (F, 3) adjacent-face indices.
      per_sample: return (B,) instead of the batch-mean scalar (the scalar
        is the mean of the per-sample values — one formula, both callers).
    """
    F = face_normals.shape[1]
    loss = 0.0
    for i in range(3):
        n2 = face_normals[:, ff[:, i]]
        cos = jnp.sum(face_normals * n2, axis=-1)
        loss = loss + jnp.mean((cos - 1.0) ** 2, axis=-1)
    loss = loss * (F / 2.0)
    return loss if per_sample else jnp.mean(loss)
