"""Tiled Pallas TPU kernel for bilinear grid sampling (texture lookup).

``grid_sample`` is a 4-corner gather; XLA lowers TPU gathers to a
serialized per-index loop (~15 ns/sample -> ~250 ms fwd / ~1.1 s fwd+bwd
for a batch of 16 512x512 texture lookups — the fragment-shader hot path,
reference ``code/rendering/fragment_shader.py`` / ``utils.py:6-12``).

TPU-native formulation (the same hat-function trick as the splat kernel):
the bilinear weight of sample p against source row h is
``hat(y_p - h) = relu(1 - |y_p - h|)``, which is nonzero exactly at
floor/ceil with the bilinear weights, and zero outside [0, H) — matching
``padding_mode='zeros'`` for free.  Sampling becomes

    out[c, p] = sum_w hat(x_p - w) * ( sum_h hat(y_p - h) * img[c, h, w] )

i.e. one MXU matmul over a y-window plus a lane reduction over x, per
8x128 sample tile.  Sample coordinates are spatially smooth in every use
(UVs from rasterization, resizes), so each tile's y-span is small: the
kernel slices a WH-row window around it and falls back, via ``lax.cond``,
to a full-height matmul for the rare tile that exceeds it (e.g. crossing
the UV-sphere pole where the mapping degenerates).

Forward + custom-VJP backward (d img via transposed window matmuls
accumulated in place; d coords via hat-derivative reductions).  The source
image (plus the dimg accumulator and dense-fallback work arrays) must fit
the ~64 MB VMEM budget — covers the 1024-wide HD textures the inverse
renderer samples during pseudo-gt generation; larger sources fall back to
the XLA gather at the call level.
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

_TH, _TW = TILE_H, TILE_W  # sample tile: 1024 px as a square footprint —
#   an 8x128 tile spans half a 256-wide sample grid, so nearly every tile
#   crosses the object and y-spans stay large; square tiles keep UV spans
#   ~4x tighter so the window ladder actually triggers.  Tiles are stored
#   as native (8, 128) blocks of a (B, C, T*8, 128) array (Mosaic block
#   divisibility) and converted to/from image layout in XLA.
_P = _TH * _TW
_SL, _LN = BLOCK_SL, BLOCK_LN  # storage block: one tile = one (8, 128) block
_WH = 128                  # y-window rows (largest ladder tier)
_NEG = -2.0                # pad coordinate (samples to zero, keeps spans tight)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hat(d):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _hat_grad(d):
    # d/dy hat(y - h) with d = y - h
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _row_iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)


def _window_start(y, H, wh):
    """Clamped window start + whether the tile's y-span fits the window.

    The start is aligned down to a sublane multiple (Mosaic requires
    dynamic second-minor slices to be provably 8-aligned).
    """
    y_min = jnp.min(y)
    y_max = jnp.max(y)
    start = jnp.clip(jnp.floor(y_min).astype(jnp.int32), 0, max(H - wh, 0))
    start = pl.multiple_of((start // 8) * 8, 8)
    ok = (y_max - start.astype(jnp.float32)) <= (wh - 2)
    return start, ok


def _precision(dot_dtype):
    return (jax.lax.Precision.HIGHEST if dot_dtype == jnp.float32 else None)


def _sample_tile(windows, x, y, row0, col0, dot_dtype=jnp.float32):
    """Bilinear sample against C per-channel (wh, ww) windows.

    x-first per-channel contraction: the intermediate is (P, wh) instead of
    (P, C*W) — at 512x512xC sources the y-first form spills ~6 MB of VMEM
    per tile and the kernel becomes traffic-bound.
    """
    wh, ww = windows[0].shape
    rows = _row_iota(wh) + row0.astype(jnp.float32)       # (1, wh)
    cols = _row_iota(ww) + col0.astype(jnp.float32)       # (1, ww)
    wy = _hat(y.reshape(_P, 1) - rows)                    # (P, wh)
    wx = _hat(x.reshape(_P, 1) - cols).astype(dot_dtype)  # (P, ww)
    outs = []
    for win_c in windows:
        t1y = jax.lax.dot_general(                        # (P, wh)
            wx, win_c.astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        outs.append(jnp.sum(wy * t1y, axis=1, keepdims=True))
    return jnp.concatenate(outs, axis=1).T                # (C, P)


def _tier_sizes(H: int, wh: int):
    """y-window ladder: smallest fitting tier wins.

    Most tiles' y-spans are tiny (uniform background UVs, smooth interior
    maps), so a 16-row window does 1/8 the matmul work of the 128-row one;
    only tiles whose span genuinely needs it pay for a bigger window or the
    dense fallback."""
    return [t for t in (16, 64) if t < min(wh, H)] + ([wh] if wh < H else [])


def _x_tiers(W: int):
    """x-window ladder (lane axis).

    Mosaic lane-dim dynamic slices must be 128-aligned, so x-windows only
    exist at 128-granularity and only pay off for wide sources; the
    channel-base offsets c*W must themselves stay 128-aligned."""
    return [256] if (W >= 384 and W % 128 == 0) else []


def _col_window_start(x, W, ww):
    """128-aligned x-window start + whether the tile's x-span fits."""
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    start = jnp.clip(jnp.floor(x_min).astype(jnp.int32), 0, max(W - ww, 0))
    start = pl.multiple_of((start // 128) * 128, 128)
    ok = (x_max - start.astype(jnp.float32)) <= (ww - 2)
    return start, ok


def _window_combos(H: int, W: int, wh: int):
    """(whx|None, xw|None) tier combos, cheapest area first (None = dense)."""
    combos = [
        (whx, xw)
        for whx in _tier_sizes(H, wh) + [None]
        for xw in _x_tiers(W) + [None]
        if not (whx is None and xw is None)
    ]
    combos.sort(key=lambda c: (c[0] or H) * (c[1] or W))
    return combos


def _combo_fits(x, y, H, W, whx, xw):
    ok = jnp.bool_(True)
    if whx is not None:
        ok = jnp.logical_and(ok, _window_start(y, H, whx)[1])
    if xw is not None:
        ok = jnp.logical_and(ok, _col_window_start(x, W, xw)[1])
    return ok


def _window_slices(x, y, H, W, whx, xw):
    """(row0, col0, row slice, per-channel column slicer) for one combo.

    Shared by the forward and backward kernels so tier selection can never
    disagree between them."""
    zero = jnp.asarray(0, jnp.int32)
    row0 = zero if whx is None else _window_start(y, H, whx)[0]
    col0 = zero if xw is None else _col_window_start(x, W, xw)[0]
    rows = slice(None) if whx is None else pl.ds(row0, whx)
    cols = (
        (lambda c: slice(c * W, (c + 1) * W)) if xw is None
        else (lambda c: pl.ds(c * W + col0, xw))
    )
    return row0, col0, rows, cols


def _tier_ladder(x, y, H, W, wh, body):
    """Nest lax.conds so the cheapest fitting combo's body runs."""
    expr = body(None, None)
    for whx, xw in reversed(_window_combos(H, W, wh)):
        def tiered(_, ok=_combo_fits(x, y, H, W, whx, xw), whx=whx, xw=xw,
                   nxt=expr):
            return jax.lax.cond(ok, body(whx, xw), nxt, 0)
        expr = tiered
    return expr(0)


def _fwd_kernel(coords_ref, img_ref, out_ref, *, H, W, C, wh,
                dot_dtype=jnp.float32):
    xy = coords_ref[0].reshape(2, _P)
    x, y = xy[0], xy[1]

    def body(whx, xw):
        def f(_):
            row0, col0, rows, cols = _window_slices(x, y, H, W, whx, xw)
            wins = [img_ref[0, rows, cols(c)] for c in range(C)]
            return _sample_tile(wins, x, y, row0, col0, dot_dtype)
        return f

    out = _tier_ladder(x, y, H, W, wh, body)
    out_ref[0] = out.reshape(C, _SL, _LN)


def _bwd_kernel(coords_ref, img_ref, dout_ref, dimg_ref, dcoords_ref, *,
                H, W, C, wh, dot_dtype=jnp.float32):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    xy = coords_ref[0].reshape(2, _P)
    x, y = xy[0], xy[1]
    dout = dout_ref[0].reshape(C, _P)                     # (C, P)

    def grads(windows, r0, c0):
        """(dgx, dgy, per-channel dimg window updates)."""
        whh, ww = windows[0].shape
        rows = _row_iota(whh) + r0.astype(jnp.float32)
        cols = _row_iota(ww) + c0.astype(jnp.float32)
        dy_rows = y.reshape(_P, 1) - rows                 # (P, whh)
        wy = _hat(dy_rows)
        wyp = _hat_grad(dy_rows)
        dx_cols = x.reshape(_P, 1) - cols                 # (P, ww)
        wx = _hat(dx_cols)
        wxp = _hat_grad(dx_cols)
        wy_d = wy.astype(dot_dtype)
        wx_d = wx.astype(dot_dtype)
        prec = _precision(dot_dtype)

        dgx = jnp.zeros((1, _P), jnp.float32)
        dgy = jnp.zeros((1, _P), jnp.float32)
        dimg_upd = []
        for c, win_raw in enumerate(windows):
            win = win_raw.astype(dot_dtype)
            t1c = jax.lax.dot_general(                    # (P, ww)
                wy_d, win,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            dc = dout[c].reshape(_P, 1)                   # (P, 1)
            # diffs are (coord - iota), so _hat_grad IS d hat/d coord
            dgx = dgx + jnp.sum(wxp * t1c * dc, axis=1).reshape(1, _P)
            # d y needs the x-first partial: (P, whh)
            t1y = jax.lax.dot_general(
                wx_d, win,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            dgy = dgy + jnp.sum(wyp * t1y * dc, axis=1).reshape(1, _P)
            # d img window: Wy^T @ (hatx * dout_c)
            dimg_upd.append(jax.lax.dot_general(
                wy_d, (wx * dc).astype(dot_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ))  # (whh, ww)
        return dgx, dgy, dimg_upd

    def body(whx, xw):
        def f(_):
            row0, col0, rows, cols = _window_slices(x, y, H, W, whx, xw)
            wins = [img_ref[0, rows, cols(c)] for c in range(C)]
            dgx, dgy, upds = grads(wins, row0, col0)
            for c, upd in enumerate(upds):
                dimg_ref[0, rows, cols(c)] += upd
            return dgx, dgy
        return f

    dgx, dgy = _tier_ladder(x, y, H, W, wh, body)
    dcoords_ref[0] = jnp.concatenate([dgx, dgy], axis=0).reshape(2, _SL, _LN)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_coords(coords, hp, wp):
    """Edge-pad sample coords to tile multiples (keeps tile spans tight)."""
    B, _, Hg, Wg = coords.shape
    return jnp.pad(
        coords, ((0, 0), (0, 0), (0, hp - Hg), (0, wp - Wg)), mode="edge"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _sample_core(coords, img_hcw, H, W, C, wh, dot_bf16=False):
    return _sample_fwd_impl(coords, img_hcw, H, W, C, wh, dot_bf16)


# shared with the rasterizer: both kernels must agree on the scheme
_tiles_to_image = tiles_to_image
_image_to_tiles = image_to_tiles


def _sample_fwd_impl(coords, img_hcw, H, W, C, wh, dot_bf16=False):
    B, _, t_sl, _ = coords.shape              # tile layout (B, 2, T*_SL, _LN)
    T = t_sl // _SL
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    kernel = functools.partial(_fwd_kernel, H=H, W=W, C=C, wh=wh,
                               dot_dtype=dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 2, _SL, _LN), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, _SL, _LN), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, t_sl, _LN), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(coords, img_hcw)


def _sample_core_fwd(coords, img_hcw, H, W, C, wh, dot_bf16=False):
    out = _sample_fwd_impl(coords, img_hcw, H, W, C, wh, dot_bf16)
    return out, (coords, img_hcw)


def _sample_core_bwd(H, W, C, wh, dot_bf16, residuals, dout):
    coords, img_hcw = residuals
    B, _, t_sl, _ = coords.shape              # tile layout
    T = t_sl // _SL
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    kernel = functools.partial(_bwd_kernel, H=H, W=W, C=C, wh=wh,
                               dot_dtype=dot_dtype)
    dimg, dcoords = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 2, _SL, _LN), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C * W), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, _SL, _LN), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, C * W), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _SL, _LN), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C * W), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, t_sl, _LN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(coords, img_hcw, dout)
    return dcoords, dimg


_sample_core.defvjp(_sample_core_fwd, _sample_core_bwd)

# v5e VMEM is ~128 MB; budget for the worst (dense-fallback) backward
# tile: source image + dimg accumulator + ~8 (P, W) hat/work arrays
_VMEM_BUDGET = 64 * 1024 * 1024


def _aligned_hw(H: int, W: int, C: int) -> tuple[int, int]:
    """Smallest (H', W') >= (H, W) satisfying the kernel's tile alignment.

    Zero rows/columns appended past the sampled range contribute nothing
    (zero padding mode), so aligning by padding is semantics-free.
    """
    Hp = _round_up(H, 8)
    Wp = W
    while (C * Wp) % 8:
        Wp += 1
    return Hp, Wp


def fits_pallas(img_shape) -> bool:
    B, H, W, C = img_shape
    Hp, Wp = _aligned_hw(H, W, C)
    img_bytes = Hp * C * Wp * 4
    work_bytes = 8 * _P * Wp * 4
    return 2 * img_bytes + work_bytes <= _VMEM_BUDGET


def grid_sample_bilinear_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                                dot_bf16: bool = False) -> jnp.ndarray:
    """Drop-in for ``ops.sampling.grid_sample_bilinear`` (tiled TPU kernel).

    img (B, H, W, C) f32, grid (B, Hg, Wg, 2) in [-1, 1] (x, y),
    align_corners=True, zero padding.  Differentiable in both inputs.
    ``dot_bf16`` runs the hat-weight matmuls single-pass in bf16 (~0.2%
    sampling error, ~3x fewer MXU passes) — used by training-loop renders;
    eval/parity paths keep the default f32 (HIGHEST) precision.
    """
    B, H, W, C = img.shape
    _, Hg, Wg, _ = grid.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    coords = jnp.stack([x, y], axis=1)                    # (B, 2, Hg, Wg)
    hp = _round_up(Hg, _TH)
    wp = _round_up(Wg, _TW)
    coords = _image_to_tiles(_pad_coords(coords, hp, wp))
    Hp, Wp = _aligned_hw(H, W, C)
    if (Hp, Wp) != (H, W):
        # align by zero-padding (e.g. the circular-padded 130-wide recon
        # texture); sample coords stay in the original pixel frame
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    img_hcw = img.transpose(0, 1, 3, 2).reshape(B, Hp, C * Wp)
    wh = min(_WH, Hp)
    out = _sample_core(coords, img_hcw, Hp, Wp, C, wh, dot_bf16)
    out = _tiles_to_image(out, Hg, Wg)        # tile -> padded image layout
    return out[:, :, :Hg, :Wg].transpose(0, 2, 3, 1)      # (B, Hg, Wg, C)
