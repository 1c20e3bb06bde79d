"""FID: activation statistics + Frechet distance.

Parity: reference ``code/utils/fid.py`` (pytorch-fid derived).  Activations
come from ``im23d_tpu.metrics.inception`` on device; the matrix sqrt runs
host-side via scipy like the reference (``fid.py:67``), with an eigh-based
numpy fallback if scipy is unavailable.
"""

from __future__ import annotations

import warnings

import numpy as np

import jax
import jax.numpy as jnp


def forward_inception_batch(model, variables, images: jnp.ndarray) -> np.ndarray:
    """(B, H, W, 3) images in [0,1] -> (B, 2048) activations (numpy)."""
    feats = jax.jit(model.apply)(variables, images)
    return np.asarray(feats)


def calculate_stats(act: np.ndarray):
    """Activation matrix -> (mean, covariance) (reference ``fid.py:26-29``)."""
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def _sqrtm(mat: np.ndarray) -> np.ndarray:
    try:
        from scipy import linalg

        res = linalg.sqrtm(mat)  # scipy >= 1.18 returns the array directly
        return res[0] if isinstance(res, tuple) else res
    except ImportError:
        # symmetric-part eigendecomposition fallback
        sym = (mat + mat.T) / 2.0
        w, v = np.linalg.eigh(sym)
        w = np.clip(w, 0, None)
        return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)).

    Parity: reference ``calculate_frechet_distance`` (``fid.py:32-82``,
    fixing its missing ``import warnings``).
    """
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        warnings.warn(
            "fid produced a singular product; adding %s to the diagonal" % eps
        )
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "Imaginary component {}".format(np.max(np.abs(covmean.imag)))
            )
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fid_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    m1, s1 = calculate_stats(act1)
    m2, s2 = calculate_stats(act2)
    return frechet_distance(m1, s1, m2, s2)
