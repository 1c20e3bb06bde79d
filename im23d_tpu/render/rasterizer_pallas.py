"""Tiled Pallas TPU kernel for differentiable triangle rasterization.

The XLA rasterizer (``rasterizer.py``) evaluates every face against every
pixel — O(F*H*W) VPU work with no locality; at 512 squared with ~2k faces
that is ~8e9 face/pixel pairs per batch of 16.  This kernel restores the
locality a CUDA rasterizer gets from its face binning (the reference's
Kaolin DIB-R ``linear_rasterizer``, ``code/rendering/renderer.py:60-67``),
re-cast for the TPU's static-shape model:

* Everything per-face is precomputed in XLA as *plane coefficients*: an
  edge function, the depth, and each interpolated attribute are all affine
  in pixel coordinates, so the per-pixel work is two FMAs per plane.  The
  prep is pure jnp and differentiable — the backward kernel only has to
  produce d(planes), and JAX's vjp of the prep chains it to vertices and
  attributes.
* Faces are Morton-sorted (16-bit interleave of the quantized bbox center)
  and grouped into chunks of 32; each chunk gets a margin-expanded bbox.
  The kernel walks chunks inside a ``fori_loop`` and skips, via
  ``lax.cond``, every chunk whose bbox misses the current 8x128 pixel tile
  — the TPU equivalent of a rasterizer's bin pass (static shapes, dynamic
  *work*).
* Hard pass: per pixel the front-most covering face wins; ties inside a
  chunk are count-averaged, across chunks the earlier chunk wins — exactly
  the XLA version's semantics.  The winner's attribute planes are
  accumulated with a {0,1} mask (gather-free) and evaluated after the loop.
* Soft pass: DIB-R coverage ``1 - prod_f (1 - exp(-d^2/sigma))`` where the
  squared point-triangle distance is built from per-segment affine dot
  coefficients; accumulated as ``sum log1p(-cov)`` like the XLA version.

Numerics are f32 end to end (bf16 edge functions would jitter face
boundaries by whole pixels at 512 squared).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from im23d_tpu.ops.tile_layout import (
    BLOCK_LN,
    BLOCK_SL,
    TILE_H,
    TILE_W,
    image_to_tiles,
    tiles_to_image,
)

_CF = 32          # faces per chunk (axis 0 of the in-kernel work arrays)
# pixel tile: 1024 pixels as a 32x32 square footprint.  An 8x128 tile spans
# half the image width at 256 squared, so chunk bboxes almost always pass
# the x test and culling only works in y; a square tile roughly halves the
# surviving face-pixel pairs.  Mosaic requires (8, 128)-divisible block
# tails, so each tile's pixels are *stored* as one native (8, 128) block of
# a (B, C, TY*TX*8, 128) array and converted to/from image layout in XLA
# (_tiles_to_image / _image_to_tiles); the winner cache never leaves tile
# layout.
_TH, _TW = TILE_H, TILE_W
_SL, _LN = BLOCK_SL, BLOCK_LN  # storage block: one tile = one (8, 128) block
_R = 128          # plane-tensor lane width (columns, padded to one lane tile)
_NEG_BIG = -1e9

# plane-tensor column layout
_E = 0            # 3 edges x (a, b, c)                      -> cols 0..8
_Z = 9            # depth plane (a, b, c)                    -> cols 9..11
_FRONT = 12       # front-face / validity flag
_SEG = 13         # 3 segments x (abx, aby, inv_ab2, ax, ay)     -> cols 13..27
_SEG_W = 5
_ATTR = 28        # A attributes x (a, b, c)                 -> cols 28..28+3A


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _part1by1(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 8 bits of v so there is a zero between each bit."""
    v = v & 0xFF
    v = (v | (v << 4)) & 0x0F0F
    v = (v | (v << 2)) & 0x3333
    v = (v | (v << 1)) & 0x5555
    return v


def _morton_order(cx: jnp.ndarray, cy: jnp.ndarray) -> jnp.ndarray:
    """(B, F) face ordering by Morton code of the quantized centers."""
    qx = jnp.clip((cx + 1.0) * 127.5, 0.0, 255.0).astype(jnp.int32)
    qy = jnp.clip((cy + 1.0) * 127.5, 0.0, 255.0).astype(jnp.int32)
    code = _part1by1(qx) | (_part1by1(qy) << 1)
    return jnp.argsort(code, axis=-1)


def prepare_planes(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: jnp.ndarray,
    cull_backfaces: bool,
    order: jnp.ndarray,
    num_chunks: int,
):
    """Per-face plane coefficients, Morton-gathered and chunk-padded.

    Differentiable in (verts, attrs) — the backward kernel returns
    d(planes) and this function's vjp carries it to the real inputs.

    Returns planes (B, NC*CF, 128) f32.
    """
    B, _, _ = verts.shape
    F = faces.shape[0]
    A = attrs.shape[-1]
    fv = verts[:, faces]                      # (B, F, 3, 3)
    x = fv[..., 0]                            # (B, F, 3)
    y = fv[..., 1]
    z = fv[..., 2]

    def edge_coeffs(i, j):
        # e_ij(p) = (xj-xi)(py-yi) - (yj-yi)(px-xi)  ->  a*px + b*py + c
        a = -(y[..., j] - y[..., i])
        b = x[..., j] - x[..., i]
        c = (y[..., j] - y[..., i]) * x[..., i] - (x[..., j] - x[..., i]) * y[..., i]
        return a, b, c

    # barycentric numerators: w0 ~ e12, w1 ~ e20, w2 ~ e01
    a12, b12, c12 = edge_coeffs(1, 2)
    a20, b20, c20 = edge_coeffs(2, 0)
    a01, b01, c01 = edge_coeffs(0, 1)

    # same expression grouping as rasterizer._edge so the front-face test
    # agrees bit-for-bit on near-degenerate slivers
    area = (x[..., 1] - x[..., 0]) * (y[..., 2] - y[..., 0]) - (
        y[..., 1] - y[..., 0]
    ) * (x[..., 2] - x[..., 0])
    if cull_backfaces:
        front = (area > 1e-9).astype(verts.dtype)
        sgn = jnp.ones_like(area)
    else:
        front = (jnp.abs(area) > 1e-9).astype(verts.dtype)
        sgn = jnp.sign(area)
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)

    def plane_of(values):  # (B, F, 3) corner values -> affine coefficients
        pa = (a12 * values[..., 0] + a20 * values[..., 1] + a01 * values[..., 2]) * inv_area
        pb = (b12 * values[..., 0] + b20 * values[..., 1] + b01 * values[..., 2]) * inv_area
        pc = (c12 * values[..., 0] + c20 * values[..., 1] + c01 * values[..., 2]) * inv_area
        return pa, pb, pc

    za, zb, zc = plane_of(z)

    cols = [
        a12 * sgn, b12 * sgn, c12 * sgn,
        a20 * sgn, b20 * sgn, c20 * sgn,
        a01 * sgn, b01 * sgn, c01 * sgn,
        za, zb, zc,
        front,
    ]
    for k in range(3):  # coverage segments (k -> k+1 mod 3)
        j = (k + 1) % 3
        abx = x[..., j] - x[..., k]
        aby = y[..., j] - y[..., k]
        ab2 = abx * abx + aby * aby
        # stored inverted: t = clip(s * inv_ab2) saves a max+div per
        # segment in both kernels; the column's cotangent is identically
        # zero (dd2/dab2 = 0, see _bwd_kernel) so the change is
        # gradient-transparent
        inv_ab2 = 1.0 / jnp.maximum(ab2, 1e-12)
        cols += [abx, aby, inv_ab2, x[..., k], y[..., k]]
    for a_i in range(A):
        pa, pb, pc = plane_of(attrs[..., a_i])
        cols += [pa, pb, pc]

    planes = jnp.stack(cols, axis=-1)         # (B, F, 31 + 3A)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, _R - planes.shape[-1])))

    planes = jnp.take_along_axis(planes, order[..., None], axis=1)
    f_pad = num_chunks * _CF
    if f_pad != F:
        planes = jnp.pad(planes, ((0, 0), (0, f_pad - F), (0, 0)))
    return planes


def _face_bboxes(verts, faces, order, num_chunks, margin):
    """Margin-expanded per-chunk bboxes (B, NC, 4): minx, miny, maxx, maxy."""
    fv = jax.lax.stop_gradient(verts)[:, faces]
    x, y = fv[..., 0], fv[..., 1]
    bb = jnp.stack(
        [x.min(-1), y.min(-1), x.max(-1), y.max(-1)], axis=-1
    )  # (B, F, 4)
    bb = jnp.take_along_axis(bb, order[..., None], axis=1)
    B, F, _ = bb.shape
    f_pad = num_chunks * _CF
    if f_pad != F:  # padded faces form an empty box
        empty = jnp.broadcast_to(
            jnp.asarray([4.0, 4.0, -4.0, -4.0], bb.dtype), (B, f_pad - F, 4)
        )
        bb = jnp.concatenate([bb, empty], axis=1)
    bb = bb.reshape(B, num_chunks, _CF, 4)
    return jnp.stack(
        [
            bb[..., 0].min(-1) - margin,
            bb[..., 1].min(-1) - margin,
            bb[..., 2].max(-1) + margin,
            bb[..., 3].max(-1) + margin,
        ],
        axis=-1,
    )


def _col(chunk, c):
    """(CF, 1) broadcastable view of one plane column."""
    return chunk[:, c:c + 1]


def _fwd_kernel(bbox_ref, planes_ref, feat_ref, soft_ref, bz_ref, bc_ref,
                *, num_chunks: int, num_attrs: int, height: int, width: int,
                sigma: float, margin: float):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    A3 = 3 * num_attrs
    P = _TH * _TW

    # pixel-center NDC coordinates, pixels flattened onto the lane axis
    # (row-major over the 32x32 tile; true H/W mapping — out-of-image
    # pixels get harmless coords and are cropped by the caller)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row = (p_idx // _TW + ty * _TH).astype(jnp.float32)
    colf = (p_idx % _TW + tx * _TW).astype(jnp.float32)
    px = (colf + 0.5) * (2.0 / width) - 1.0   # (1, P)
    py = 1.0 - (row + 0.5) * (2.0 / height)

    tile_x0 = tx.astype(jnp.float32) * _TW * (2.0 / width) - 1.0
    tile_x1 = tile_x0 + _TW * (2.0 / width)
    tile_y1 = 1.0 - ty.astype(jnp.float32) * _TH * (2.0 / height)
    tile_y0 = tile_y1 - _TH * (2.0 / height)

    inv_sigma = 1.0 / sigma

    def chunk_body(c, carry):
        best_z, best_c, wacc, log_miss = carry
        # bboxes are margin-expanded for the soft term; the hard pass only
        # needs the unexpanded box, so boundary chunks skip the winner work
        active_cov = (
            (bbox_ref[0, c, 0] <= tile_x1)
            & (bbox_ref[0, c, 2] >= tile_x0)
            & (bbox_ref[0, c, 1] <= tile_y1)
            & (bbox_ref[0, c, 3] >= tile_y0)
        )
        active_hard = (
            (bbox_ref[0, c, 0] + margin <= tile_x1)
            & (bbox_ref[0, c, 2] - margin >= tile_x0)
            & (bbox_ref[0, c, 1] + margin <= tile_y1)
            & (bbox_ref[0, c, 3] - margin >= tile_y0)
        )

        def work(_):
            chunk = planes_ref[0, pl.ds(c * _CF, _CF), :]  # (CF, R)
            front = _col(chunk, _FRONT)
            inside0 = front > 0.5
            for i in range(3):
                e = (_col(chunk, _E + 3 * i) * px
                     + _col(chunk, _E + 3 * i + 1) * py
                     + _col(chunk, _E + 3 * i + 2))
                inside0 = inside0 & (e >= 0.0)
            inside = inside0  # (CF, P)

            def hard(_):
                zval = (_col(chunk, _Z) * px + _col(chunk, _Z + 1) * py
                        + _col(chunk, _Z + 2))
                z_masked = jnp.where(inside, zval, _NEG_BIG)
                cz = jnp.max(z_masked, axis=0, keepdims=True)  # (1, P)
                wsel = (inside & (z_masked >= cz)).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(wsel, axis=0, keepdims=True), 1.0)
                # winner attribute planes via one MXU contraction over faces
                w_chunk = jax.lax.dot_general(
                    chunk[:, _ATTR:_ATTR + A3], wsel,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ) / cnt  # (A3, P)
                better = cz > best_z  # strict: earlier chunks keep ties
                return (jnp.where(better, cz, best_z),
                        jnp.where(better, c, best_c),
                        jnp.where(better, w_chunk, wacc))

            new_z, new_c, new_w = jax.lax.cond(
                active_hard, hard, lambda _: (best_z, best_c, wacc), 0
            )

            # soft coverage: squared distance to the nearest of 3 segments,
            # computed from the residual vector ap - t*ab (the algebraically
            # equal q - s^2/ab2 form cancels catastrophically in f32 near
            # the segment, and d2/sigma amplifies the error 1e4x)
            d2 = None
            for k in range(3):
                base = _SEG + k * _SEG_W
                abx, aby = _col(chunk, base), _col(chunk, base + 1)
                inv_ab2 = _col(chunk, base + 2)
                ax, ay = _col(chunk, base + 3), _col(chunk, base + 4)
                apx = px - ax
                apy = py - ay
                s = apx * abx + apy * aby
                t = jnp.clip(s * inv_ab2, 0.0, 1.0)
                dx = apx - t * abx
                dy = apy - t * aby
                d2k = dx * dx + dy * dy
                d2 = d2k if d2 is None else jnp.minimum(d2, d2k)
            d2 = jnp.where(inside, 0.0, d2)
            cov = jnp.where(front > 0.5, jnp.exp(-d2 * inv_sigma), 0.0)
            new_lm = log_miss + jnp.sum(
                jnp.log1p(-jnp.minimum(cov, 1.0 - 1e-7)), axis=0, keepdims=True
            )
            return new_z, new_c, new_w, new_lm

        return jax.lax.cond(active_cov, work, lambda _: carry, 0)

    best_z0 = jnp.full((1, P), _NEG_BIG, jnp.float32)
    best_c0 = jnp.full((1, P), -1, jnp.int32)
    wacc0 = jnp.zeros((A3, P), jnp.float32)
    lm0 = jnp.zeros((1, P), jnp.float32)
    best_z, best_c, wacc, log_miss = jax.lax.fori_loop(
        0, num_chunks, chunk_body, (best_z0, best_c0, wacc0, lm0)
    )

    covered = best_z > _NEG_BIG * 0.5  # (1, P)
    rows = []
    for a_i in range(num_attrs):
        val = (
            wacc[3 * a_i:3 * a_i + 1] * px
            + wacc[3 * a_i + 1:3 * a_i + 2] * py
            + wacc[3 * a_i + 2:3 * a_i + 3]
        )
        rows.append(jnp.where(covered, val, 0.0))
    feat_ref[0] = jnp.concatenate(rows, axis=0).reshape(num_attrs, _SL, _LN)
    soft_ref[0] = (1.0 - jnp.exp(log_miss)).reshape(1, _SL, _LN)
    # winner cache: lets the backward skip its find pass
    bz_ref[0] = best_z.reshape(1, _SL, _LN)
    bc_ref[0] = best_c.reshape(1, _SL, _LN)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bwd_kernel(bbox_ref, planes_ref, dfeat_ref, dsoft_ref, soft_ref,
                bz_ref, bc_ref, dplanes_ref, *, num_chunks: int,
                num_attrs: int, height: int, width: int, sigma: float,
                margin: float):
    """d(planes) for the tiled rasterizer.

    The forward saved each pixel's winning (z, chunk); the single pass here
    walks chunks, rebuilding the winner mask and the coverage terms,
    and accumulates per-face gradients:

    * attribute planes: one MXU contraction of the normalized winner mask
      with the (A3, P) pixel-basis-weighted upstream grad.
    * coverage: d2 = |ap - t*ab|^2 has residual orthogonal to ab wherever t
      is unclamped (and dt = 0 where clamped), so every t-chain term
      vanishes identically: dd2/dap = 2(dx, dy), dd2/dab = -2t(dx, dy),
      dd2/da = -2(dx, dy), dd2/dab2 = 0.

    Grid iterates (b, ty, tx) serially on the core; the dplanes block is
    revisited per tile and accumulated in place (zeroed on the first tile).
    """
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    A3 = 3 * num_attrs
    P = _TH * _TW

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row = (p_idx // _TW + ty * _TH).astype(jnp.float32)
    colf = (p_idx % _TW + tx * _TW).astype(jnp.float32)
    px = (colf + 0.5) * (2.0 / width) - 1.0   # (1, P)
    py = 1.0 - (row + 0.5) * (2.0 / height)

    tile_x0 = tx.astype(jnp.float32) * _TW * (2.0 / width) - 1.0
    tile_x1 = tile_x0 + _TW * (2.0 / width)
    tile_y1 = 1.0 - ty.astype(jnp.float32) * _TH * (2.0 / height)
    tile_y0 = tile_y1 - _TH * (2.0 / height)

    inv_sigma = 1.0 / sigma

    @pl.when((ty == 0) & (tx == 0))
    def _():
        dplanes_ref[0] = jnp.zeros_like(dplanes_ref[0])

    def chunk_active(c, with_margin):
        m = 0.0 if with_margin else margin
        return (
            (bbox_ref[0, c, 0] + m <= tile_x1)
            & (bbox_ref[0, c, 2] - m >= tile_x0)
            & (bbox_ref[0, c, 1] + m <= tile_y1)
            & (bbox_ref[0, c, 3] - m >= tile_y0)
        )

    def inside_and_z(chunk):
        front = _col(chunk, _FRONT)
        inside = front > 0.5
        for i in range(3):
            e = (_col(chunk, _E + 3 * i) * px
                 + _col(chunk, _E + 3 * i + 1) * py
                 + _col(chunk, _E + 3 * i + 2))
            inside = inside & (e >= 0.0)
        zval = (_col(chunk, _Z) * px + _col(chunk, _Z + 1) * py
                + _col(chunk, _Z + 2))
        return front, inside, zval

    # winner cache from the forward (replaces the old find pass)
    best_z = bz_ref[0].reshape(1, P)
    best_c = bc_ref[0].reshape(1, P)

    # upstream grads in pixel-on-lanes layout
    dfeat = dfeat_ref[0].reshape(num_attrs, P)
    dsoft = dsoft_ref[0].reshape(1, P)
    soft = soft_ref[0].reshape(1, P)
    dlm = -dsoft * (1.0 - soft)          # d(log_miss)

    dw_rows = []
    for a_i in range(num_attrs):
        dfa = dfeat[a_i:a_i + 1]
        dw_rows += [dfa * px, dfa * py, dfa]
    dw = jnp.concatenate(dw_rows, axis=0)  # (A3, P)

    # pass 2: accumulate gradients
    def grad_body(c, _):
        def work(_):
            chunk = planes_ref[0, pl.ds(c * _CF, _CF), :]
            front, inside, zval = inside_and_z(chunk)

            # winner-mask gradient to the attribute planes
            wsel = (inside & (zval >= best_z) & (best_c == c)).astype(
                jnp.float32
            )
            cnt = jnp.maximum(jnp.sum(wsel, axis=0, keepdims=True), 1.0)
            dattr = jax.lax.dot_general(
                wsel / cnt, dw,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (CF, A3)

            # coverage gradient (recompute d2 per segment + argmin routing)
            seg_cache = []
            d2 = None
            for k in range(3):
                base = _SEG + k * _SEG_W
                abx, aby = _col(chunk, base), _col(chunk, base + 1)
                inv_ab2 = _col(chunk, base + 2)
                ax, ay = _col(chunk, base + 3), _col(chunk, base + 4)
                apx = px - ax
                apy = py - ay
                s = apx * abx + apy * aby
                t = jnp.clip(s * inv_ab2, 0.0, 1.0)
                dx = apx - t * abx
                dy = apy - t * aby
                d2k = dx * dx + dy * dy
                seg_cache.append((dx, dy, t, d2k))
                d2 = d2k if d2 is None else jnp.minimum(d2, d2k)
            d2m = jnp.where(inside, 0.0, d2)
            cov = jnp.where(front > 0.5, jnp.exp(-d2m * inv_sigma), 0.0)
            cov_c = jnp.minimum(cov, 1.0 - 1e-7)
            dcov = jnp.where(
                cov < 1.0 - 1e-7, dlm * (-1.0 / (1.0 - cov_c)), 0.0
            )
            dd2 = jnp.where(
                inside | (front <= 0.5), 0.0, dcov * cov * (-inv_sigma)
            )  # (CF, P)

            seg_grads = []
            taken = None
            for k in range(3):
                dx, dy, t, d2k = seg_cache[k]
                is_min = d2k == d2
                if taken is None:
                    mk = is_min
                    taken = is_min
                else:
                    mk = is_min & ~taken
                    taken = taken | is_min
                g = jnp.where(mk, dd2, 0.0)
                gdx = g * dx
                gdy = g * dy
                seg_grads += [
                    jnp.sum(-2.0 * gdx * t, axis=1, keepdims=True),  # abx
                    jnp.sum(-2.0 * gdy * t, axis=1, keepdims=True),  # aby
                    jnp.zeros((_CF, 1), jnp.float32),                # ab2
                    jnp.sum(-2.0 * gdx, axis=1, keepdims=True),      # ax
                    jnp.sum(-2.0 * gdy, axis=1, keepdims=True),      # ay
                ]

            dchunk = jnp.concatenate(
                [jnp.zeros((_CF, _SEG), jnp.float32)]
                + seg_grads
                + [dattr,
                   jnp.zeros((_CF, _R - _ATTR - A3), jnp.float32)],
                axis=1,
            )  # (CF, R)
            dplanes_ref[0, pl.ds(c * _CF, _CF), :] += dchunk
            return 0

        return jax.lax.cond(chunk_active(c, True), work, lambda _: 0, 0)

    jax.lax.fori_loop(0, num_chunks, grad_body, 0)


def _raster_bwd_impl(planes, bboxes, dfeat, dsoft, soft, bz, bc, height,
                     width, sigma, margin, num_attrs):
    B, f_pad, _ = planes.shape
    num_chunks = f_pad // _CF
    hp = _round_up(height, _TH)
    wp = _round_up(width, _TW)
    kernel = functools.partial(
        _bwd_kernel,
        num_chunks=num_chunks,
        num_attrs=num_attrs,
        height=height,
        width=width,
        sigma=float(sigma),
        margin=float(margin),
    )
    TX = wp // _TW
    img_spec = lambda ch: pl.BlockSpec(
        (1, ch, _SL, _LN), lambda b, i, j: (b, 0, i * TX + j, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, hp // _TH, wp // _TW),
        in_specs=[
            pl.BlockSpec((1, num_chunks, 4), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f_pad, _R), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            img_spec(num_attrs),
            img_spec(1),
            img_spec(1),
            img_spec(1),
            img_spec(1),
        ],
        out_specs=pl.BlockSpec((1, f_pad, _R), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, f_pad, _R), jnp.float32),
        interpret=_use_interpret(),
    )(bboxes, planes, dfeat, dsoft, soft, bz, bc)


# shared with the sampler: both kernels must agree on the scheme
_tiles_to_image = tiles_to_image
_image_to_tiles = image_to_tiles


def _rasterize_from_planes(planes, bboxes, height, width, sigma, margin,
                           num_attrs):
    """Run the tiled kernel. planes (B, NC*CF, R), bboxes (B, NC, 4)."""
    B, f_pad, _ = planes.shape
    num_chunks = f_pad // _CF
    hp = _round_up(height, _TH)
    wp = _round_up(width, _TW)
    kernel = functools.partial(
        _fwd_kernel,
        num_chunks=num_chunks,
        num_attrs=num_attrs,
        height=height,
        width=width,
        sigma=float(sigma),
        margin=float(margin),
    )
    TY, TX = hp // _TH, wp // _TW
    img_out = lambda ch, dt: (
        pl.BlockSpec((1, ch, _SL, _LN), lambda b, i, j: (b, 0, i * TX + j, 0),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((B, ch, TY * TX * _SL, _LN), dt),
    )
    outs = [img_out(num_attrs, jnp.float32), img_out(1, jnp.float32),
            img_out(1, jnp.float32), img_out(1, jnp.int32)]
    feat_t, soft_t, bz, bc = pl.pallas_call(
        kernel,
        grid=(B, TY, TX),
        in_specs=[
            pl.BlockSpec((1, num_chunks, 4), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f_pad, _R), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[o[0] for o in outs],
        out_shape=[o[1] for o in outs],
        interpret=_use_interpret(),
    )(bboxes, planes)
    # tile layout -> NHWC crop; soft additionally kept in tile layout for
    # the backward (with bz/bc, which never leave tile layout)
    feat = _tiles_to_image(feat_t, height, width)[
        :, :, :height, :width].transpose(0, 2, 3, 1)
    soft = _tiles_to_image(soft_t, height, width)[
        :, :, :height, :width].transpose(0, 2, 3, 1)
    return feat, soft, soft_t, bz, bc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _raster_core(planes, bboxes, height, width, sigma, margin, num_attrs):
    feat, soft, _, _, _ = _rasterize_from_planes(
        planes, bboxes, height, width, sigma, margin, num_attrs
    )
    return feat, soft


def _raster_core_fwd(planes, bboxes, height, width, sigma, margin, num_attrs):
    feat, soft, soft_t, bz, bc = _rasterize_from_planes(
        planes, bboxes, height, width, sigma, margin, num_attrs
    )
    return (feat, soft), (planes, bboxes, soft_t, bz, bc)


def _raster_core_bwd(height, width, sigma, margin, num_attrs, residuals,
                     grads):
    planes, bboxes, soft_t, bz, bc = residuals
    dfeat, dsoft = grads                 # cropped NHWC cotangents
    hp = _round_up(height, _TH)
    wp = _round_up(width, _TW)

    def to_tiles(x):
        x = x.transpose(0, 3, 1, 2)
        return _image_to_tiles(jnp.pad(
            x, ((0, 0), (0, 0), (0, hp - height), (0, wp - width))
        ))

    dplanes = _raster_bwd_impl(
        planes, bboxes, to_tiles(dfeat), to_tiles(dsoft),
        soft_t, bz, bc, height, width, sigma, margin,
        num_attrs,
    )
    return dplanes, jnp.zeros_like(bboxes)


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "sigma", "cull_backfaces")
)
def rasterize_tiled(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: jnp.ndarray,
    height: int,
    width: int,
    sigma: float = 1e-4,
    cull_backfaces: bool = True,
):
    """Drop-in replacement for ``rasterizer.rasterize`` (tiled TPU kernel).

    Same contract: verts (B, V, 3) NDC (y up, larger z closer), faces
    (F, 3), attrs (B, F, 3, A); returns (feat (B, H, W, A), soft
    (B, H, W, 1)).
    """
    B = verts.shape[0]
    F = faces.shape[0]
    A = attrs.shape[-1]
    if _ATTR + 3 * A > _R:
        raise ValueError(f"too many attribute channels for plane layout: {A}")

    fv = jax.lax.stop_gradient(verts)[:, faces]
    cx = 0.5 * (fv[..., 0].min(-1) + fv[..., 0].max(-1))
    cy = 0.5 * (fv[..., 1].min(-1) + fv[..., 1].max(-1))
    order = _morton_order(cx, cy)             # (B, F)

    num_chunks = _round_up(F, _CF) // _CF
    # coverage is negligible past d2 > ~16*sigma: exp(-16) ~ 1e-7
    margin = 4.0 * float(sigma) ** 0.5
    planes = prepare_planes(verts, faces, attrs, cull_backfaces, order, num_chunks)
    bboxes = _face_bboxes(verts, faces, order, num_chunks, margin)
    # the kernel pair differentiates w.r.t. the plane tensor; prepare_planes
    # is plain jnp, so JAX chains d(planes) -> (d verts, d attrs) for free
    return _raster_core(planes, bboxes, height, width, sigma, margin, A)
