"""Image <-> native-block tile layout for square-footprint Pallas kernels.

Mosaic requires the last two block dims to divide (8, 128), so a kernel
that wants a square 32x32-pixel tile (tighter bbox/UV-span locality than
the native 8x128 strip) stores each tile's 1024 pixels as one (8, 128)
block of a (B, C, TY*TX*8, 128) array.  These converters move whole images
between that tile layout and padded NCHW in XLA; they are exact inverses.

Shared by ``render/rasterizer_pallas.py`` and ``ops/sampling_pallas.py`` —
the two kernels must agree on the scheme since cotangents produced against
one kernel's output layout are consumed by the other's input transform.
"""

from __future__ import annotations

TILE_H, TILE_W = 32, 32    # logical pixel footprint of one tile
BLOCK_SL, BLOCK_LN = 8, 128  # native storage block: one tile = one block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tiles_to_image(x, height: int, width: int):
    """Tile layout (B, C, TY*TX*BLOCK_SL, BLOCK_LN) -> padded (B, C, hp, wp)."""
    B, C = x.shape[:2]
    hp = _round_up(height, TILE_H)
    wp = _round_up(width, TILE_W)
    TY, TX = hp // TILE_H, wp // TILE_W
    x = x.reshape(B, C, TY, TX, TILE_H, TILE_W)
    return x.transpose(0, 1, 2, 4, 3, 5).reshape(B, C, hp, wp)


def image_to_tiles(x):
    """Padded (B, C, hp, wp) -> tile layout (B, C, TY*TX*BLOCK_SL, BLOCK_LN)."""
    B, C, hp, wp = x.shape
    TY, TX = hp // TILE_H, wp // TILE_W
    x = x.reshape(B, C, TY, TILE_H, TX, TILE_W).transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(B, C, TY * TX * BLOCK_SL, BLOCK_LN)
