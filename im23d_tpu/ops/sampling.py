"""Image/UV sampling and padding ops (NHWC convention).

JAX has no ``grid_sample``; we implement exact bilinear sampling with
``align_corners=True`` + zero padding semantics to match the reference's
pinned behavior (``code/rendering/utils.py:6-12``), which the UV topo-map
compensation math depends on bit-for-bit (SURVEY.md §7.4 #4).

All ops here are elementwise/gather — they fuse into surrounding XLA
computations; the bilinear gather is a vectorized 4-corner ``take`` rather
than a scalar loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with align_corners=True, zero padding.

    Args:
      img: (B, H, W, C) source image.
      grid: (B, Hg, Wg, 2) sample coordinates, last axis (x, y) in [-1, 1];
        align_corners=True maps -1 -> pixel 0 and +1 -> pixel size-1.

    Returns:
      (B, Hg, Wg, C) sampled values; out-of-range corners contribute zero
      (torch ``padding_mode='zeros'``).
    """
    B, H, W, C = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, Hg, Wg)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(*idx.shape, C)
        return vals * valid[..., None].astype(img.dtype)

    out = (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
    )
    return out


def circpad(x: jnp.ndarray, amount: int = 1) -> jnp.ndarray:
    """Circular padding along the width axis of an NHWC tensor.

    Parity: reference ``circpad`` (``rendering/utils.py:29-33``), NCHW there.
    """
    left = x[:, :, :amount, :]
    right = x[:, :, -amount:, :]
    return jnp.concatenate([right, x, left], axis=2)


def symmetrize_texture(x: jnp.ndarray) -> jnp.ndarray:
    """Even symmetry along the width axis (N -> 2N), NHWC.

    Parity: reference ``symmetrize_texture`` (``rendering/utils.py:15-18``).
    """
    xf = jnp.flip(x, axis=2)
    half = xf.shape[2] // 2
    return jnp.concatenate([xf[:, :, half:, :], x, xf[:, :, :half, :]], axis=2)


def adjust_poles(tex: jnp.ndarray) -> jnp.ndarray:
    """Replace top/bottom rows with their row-means (UV sphere poles), NHWC.

    Parity: reference ``adjust_poles`` (``rendering/utils.py:21-26``).
    """
    top = jnp.mean(tex[:, :1], axis=2, keepdims=True)
    bottom = jnp.mean(tex[:, -1:], axis=2, keepdims=True)
    W = tex.shape[2]
    return jnp.concatenate(
        [
            jnp.broadcast_to(top, (tex.shape[0], 1, W, tex.shape[3])),
            tex[:, 1:-1],
            jnp.broadcast_to(bottom, (tex.shape[0], 1, W, tex.shape[3])),
        ],
        axis=1,
    )


def resize_bilinear(
    img: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear resize of (B, H, W[, C]) with torch align_corners semantics.

    Used for the mask half-downsampling in the unsupervised loss
    (``unsupervised_part.py:108``: F.interpolate scale 1/2, align_corners).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    B, H, W, C = img.shape
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, out_h)
        xs = jnp.linspace(0.0, W - 1.0, out_w)
    else:
        ys = jnp.clip((jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5, 0, H - 1)
        xs = jnp.clip((jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5, 0, W - 1)
    # Axis-aligned resize is separable, and the bilinear weight of source
    # pixel i at position x is exactly the hat function max(0, 1 - |x - i|):
    # two small interpolation matmuls on the MXU instead of 4 gathers (the
    # gather formulation profiled at 20 ms/step at chairs scale just for the
    # mask downsample).
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - jnp.arange(H)[None, :]))
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - jnp.arange(W)[None, :]))
    out = jnp.einsum(
        "oh,bhwc->bowc", ry.astype(img.dtype), img,
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "pw,bowc->bopc", rx.astype(img.dtype), out,
        preferred_element_type=jnp.float32,
    ).astype(img.dtype)
    return out[..., 0] if squeeze else out


def resize_bilinear_half(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution bilinear downsample with align_corners=True."""
    H = img.shape[1]
    W = img.shape[2] if img.ndim >= 3 else img.shape[1]
    return resize_bilinear(img, H // 2, W // 2, align_corners=True)
