"""Pallas TPU kernel for trilinear point splatting (the framework's hottest op).

Why not scatter: XLA TPU lowers scatter-add to a serialized per-update loop
(~27 ns/update); at chairs scale (480 clouds x 8000 points x 8 corners) the
forward alone costs ~400 ms and the backward ~800 ms.

TPU-native formulation: the trilinear weight of point n along axis y for
*every* grid slot i is the hat function ``hy[n, i] = relu(1 - |gy_n - i|)``
(nonzero exactly at floor/ceil with weights 1-frac / frac).  The voxel grid
is then the rank-N factorized 3-tensor

    V[z, y, x] = sum_n c_n * hz[n, z] * hy[n, y] * hx[n, x]

computed per z-slab as a dense MXU matmul ``(Wy * hz_row) @ Wx^T`` — no
scatters at all.  Weight matrices are built once per cloud on the VPU in
layout (S, N) (points on the 128-lane axis), matmuls run in bf16 with f32
accumulation.  The backward pass processes 4 z-slabs per iteration as
(ZC, S, S) x (S, N) dot_generals (``M = G @ Wx``, ``P = G^T-free form via
contraction dims``) plus hat-derivative reductions, implemented as a second
kernel under ``jax.custom_vjp``.

Parity: same semantics as ``ops.voxel.trilinear_splat`` (the XLA reference
implementation, kept for CPU tests), which itself implements the intent of
the reference ``TrilinearInterpolation`` (``code/utils/trilinear_interpolation.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hat(diff: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(diff))


def _hat_grad(diff: jnp.ndarray) -> jnp.ndarray:
    # d/dg relu(1 - |g - i|) = -sign(g - i) on |g - i| < 1 (0 elsewhere)
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)


def _precision(dot_dtype):
    # f32-parity mode must not fall back to the TPU's default bf16 passes
    return None if dot_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def _fwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, out_ref, *, size: int,
                dot_dtype, z_chunk: int):
    S = size
    N = gz_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)

    wy = (_hat(iota - gy_ref[0, 0][None, :])).astype(dot_dtype)  # (S, N)
    wx_t = (_hat(iota - gx_ref[0, 0][None, :])).astype(dot_dtype)
    gz = gz_ref[0, 0][None, :]
    c = c_ref[0, 0][None, :]

    def body(zc, _):
        z0 = zc * z_chunk
        # hat weights of the z_chunk slabs: (z_chunk, 1, N)
        dz = gz - (
            jax.lax.broadcasted_iota(jnp.int32, (z_chunk, 1, N), 0).astype(
                jnp.float32
            )
            + z0.astype(jnp.float32)
        )
        hz = (_hat(dz) * c).astype(dot_dtype)
        a = (wy[None] * hz).reshape(z_chunk * S, N)  # (z_chunk*S, N)
        slab = jax.lax.dot_general(
            a, wx_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )  # (z_chunk*S, S)
        out_ref[0, pl.ds(z0, z_chunk)] = slab.reshape(z_chunk, S, S)
        return 0

    jax.lax.fori_loop(0, S // z_chunk, body, 0)


def _bwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, g_ref,
                dgz_ref, dgy_ref, dgx_ref, dc_ref, *, size: int, dot_dtype,
                z_chunk: int):
    S = size
    N = gz_ref.shape[-1]
    ZC = z_chunk
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)

    dy = iota - gy_ref[0, 0][None, :]
    dx = iota - gx_ref[0, 0][None, :]
    hat_dy = _hat(dy)              # (S, N)
    hatp_dy = _hat_grad(dy)
    hatp_dx = _hat_grad(dx)
    wy_d = hat_dy.astype(dot_dtype)
    wx_d = _hat(dx).astype(dot_dtype)
    gz = gz_ref[0, 0][None, :]
    c = c_ref[0, 0][None, :]

    def body(zc, carry):
        # process ZC z-slabs per iteration: the contractions become
        # (ZC, S, S) x (S, N) dot_generals with free batch dims — 4-8x the
        # MXU M-dimension of the old one-slab-at-a-time formulation
        dgz, dgy, dgx, dc = carry
        z0 = zc * ZC
        g_c = g_ref[0, pl.ds(z0, ZC)].astype(dot_dtype)    # (ZC, S, S)
        dz = gz[None] - (
            jax.lax.broadcasted_iota(jnp.int32, (ZC, 1, N), 0).astype(
                jnp.float32
            )
            + z0.astype(jnp.float32)
        )  # (ZC, 1, N)
        hz = _hat(dz)[:, 0]        # (ZC, N)
        hzp = _hat_grad(dz)[:, 0]

        # M[z, y, n] = sum_x G[z, y, x] * Wx[x, n]
        m = jax.lax.dot_general(
            g_c, wx_d, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )  # (ZC, S, N)
        t0 = jnp.sum(hat_dy[None] * m, axis=1)             # (ZC, N)
        t1 = jnp.sum(hatp_dy[None] * m, axis=1)
        # P[z, x, n] = sum_y G[z, y, x] * Wy[y, n]
        p = jax.lax.dot_general(
            g_c, wy_d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )  # (ZC, S, N)
        t2 = jnp.sum(hatp_dx[None] * p, axis=1)

        # d hat/dg: hz uses diff = gz - z (direct); wy/wx use diff = iota - g,
        # so the chain picks up a -1 for the y and x terms.
        dgz = dgz + jnp.sum(hzp * t0, axis=0, keepdims=True) * c
        dgy = dgy - jnp.sum(hz * t1, axis=0, keepdims=True) * c
        dgx = dgx - jnp.sum(hz * t2, axis=0, keepdims=True) * c
        dc = dc + jnp.sum(hz * t0, axis=0, keepdims=True)
        return dgz, dgy, dgx, dc

    zero = jnp.zeros((1, N), jnp.float32)
    dgz, dgy, dgx, dc = jax.lax.fori_loop(
        0, S // ZC, body, (zero, zero, zero, zero)
    )
    dgz_ref[0] = dgz
    dgy_ref[0] = dgy
    dgx_ref[0] = dgx
    dc_ref[0] = dc


def _blur_yx_in_vmem(v, band, dot_dtype):
    """Y- then X-blur of a (Z, Y, X) array living in VMEM/registers.

    ``band`` is the (S, S) Toeplitz matrix of a *symmetric* kernel (so the
    matrix is symmetric and blur == blur^T, which the fused backward relies
    on).  Both steps contract dim 1 — the only 3-D contraction Mosaic
    lowers without a vector shape-cast — and the axis cycling restores
    (Z, Y, X) order:  (Z,Y,X) -c1-> (Z,X,Y') -c1-> (Z,Y',X').
    The Z blur stays outside the kernel (a dim-0 contraction would need an
    unsupported (S,S,S)->(S,S*S) vector reshape).
    """
    prec = _precision(dot_dtype)
    b = band.astype(dot_dtype)
    v = jax.lax.dot_general(
        v.astype(dot_dtype), b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (Z, X, Y')
    v = jax.lax.dot_general(
        v.astype(dot_dtype), b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (Z, Y', X')
    return v


# For a symmetric band the VJP of the Y/X blur is the Y/X blur itself:
# dv0[z,y,x] = sum_{y',x'} g[z,y',x'] M[y',y] M[x',x], and applying the same
# two dim-1 contractions to g yields exactly that (the axis cycling
# (Z,Y,X)->(Z,X,Y')->(Z,Y',X') self-inverts after two steps).
_blur_yx_transpose_in_vmem = _blur_yx_in_vmem


def _splat_to(vox_ref, gz_ref, gy_ref, gx_ref, c_ref, *, size, dot_dtype,
              z_chunk):
    """Shared splat loop: writes the raw (unclamped) grid into ``vox_ref``."""
    S = size
    N = gz_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    wy = (_hat(iota - gy_ref[0, 0][None, :])).astype(dot_dtype)
    wx_t = (_hat(iota - gx_ref[0, 0][None, :])).astype(dot_dtype)
    gz = gz_ref[0, 0][None, :]
    c = c_ref[0, 0][None, :]

    def body(zc, _):
        z0 = zc * z_chunk
        dz = gz - (
            jax.lax.broadcasted_iota(jnp.int32, (z_chunk, 1, N), 0).astype(
                jnp.float32
            )
            + z0.astype(jnp.float32)
        )
        hz = (_hat(dz) * c).astype(dot_dtype)
        a = (wy[None] * hz).reshape(z_chunk * S, N)
        slab = jax.lax.dot_general(
            a, wx_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        vox_ref[pl.ds(z0, z_chunk)] = slab.reshape(z_chunk, S, S)
        return 0

    jax.lax.fori_loop(0, S // z_chunk, body, 0)


def _fused_fwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, band_ref,
                      out_ref, vox_ref, *, size: int, dot_dtype, z_chunk: int):
    """splat -> clamp -> Y/X blur, all in VMEM (Z blur + scale + clamp run
    outside as one XLA pass — see splat_blur_pallas)."""
    _splat_to(vox_ref, gz_ref, gy_ref, gx_ref, c_ref, size=size,
              dot_dtype=dot_dtype, z_chunk=z_chunk)
    v = jnp.minimum(vox_ref[:], 1.0)  # splat output is >= 0 by construction
    out_ref[0] = _blur_yx_in_vmem(v, band_ref[:], dot_dtype)


def _fused_bwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, band_ref,
                      g_ref, dgz_ref, dgy_ref, dgx_ref, dc_ref,
                      vox_ref, gs_ref, *, size: int, dot_dtype, z_chunk: int):
    """VJP of the fused op.  Recomputes the splat grid (cheaper than carrying
    a (B, S^3) residual through HBM), applies the transposed Y/X blur and the
    clamp mask in VMEM, then runs the splat backward contraction."""
    S = size
    N = gz_ref.shape[-1]
    ZC = z_chunk

    # -- recompute forward splat ------------------------------------------
    _splat_to(vox_ref, gz_ref, gy_ref, gx_ref, c_ref, size=S,
              dot_dtype=dot_dtype, z_chunk=ZC)

    # -- blur^T + clamp cotangent (splat >= 0: only min(v, 1) can bind,
    # and lax.min passes the gradient on ties, hence <=) -------------------
    gb = _blur_yx_transpose_in_vmem(g_ref[0], band_ref[:], dot_dtype)
    gs_ref[:] = gb * (vox_ref[:] <= 1.0).astype(jnp.float32)

    # -- splat backward against gs ----------------------------------------
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    dy = iota - gy_ref[0, 0][None, :]
    dx = iota - gx_ref[0, 0][None, :]
    hat_dy = _hat(dy)
    hatp_dy = _hat_grad(dy)
    hatp_dx = _hat_grad(dx)
    wy_d = hat_dy.astype(dot_dtype)
    wx_d = _hat(dx).astype(dot_dtype)
    gz = gz_ref[0, 0][None, :]
    c = c_ref[0, 0][None, :]

    def body(zc, carry):
        dgz, dgy, dgx, dc = carry
        z0 = zc * ZC
        g_c = gs_ref[pl.ds(z0, ZC)].astype(dot_dtype)
        dz = gz[None] - (
            jax.lax.broadcasted_iota(jnp.int32, (ZC, 1, N), 0).astype(
                jnp.float32
            )
            + z0.astype(jnp.float32)
        )
        hz = _hat(dz)[:, 0]
        hzp = _hat_grad(dz)[:, 0]
        m = jax.lax.dot_general(
            g_c, wx_d, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        t0 = jnp.sum(hat_dy[None] * m, axis=1)
        t1 = jnp.sum(hatp_dy[None] * m, axis=1)
        p = jax.lax.dot_general(
            g_c, wy_d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        t2 = jnp.sum(hatp_dx[None] * p, axis=1)
        dgz = dgz + jnp.sum(hzp * t0, axis=0, keepdims=True) * c
        dgy = dgy - jnp.sum(hz * t1, axis=0, keepdims=True) * c
        dgx = dgx - jnp.sum(hz * t2, axis=0, keepdims=True) * c
        dc = dc + jnp.sum(hz * t0, axis=0, keepdims=True)
        return dgz, dgy, dgx, dc

    zero = jnp.zeros((1, N), jnp.float32)
    dgz, dgy, dgx, dc = jax.lax.fori_loop(
        0, S // ZC, body, (zero, zero, zero, zero)
    )
    dgz_ref[0] = dgz
    dgy_ref[0] = dgy
    dgx_ref[0] = dgx
    dc_ref[0] = dc


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _splat_grid(gz, gy, gx, c, size: int, dot_bf16: bool):
    return _splat_fwd_impl(gz, gy, gx, c, size, dot_bf16)


def _splat_fwd_impl(gz, gy, gx, c, size: int, dot_bf16: bool):
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _fwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec] * 4,
        out_specs=pl.BlockSpec(
            (1, S, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, S, S), jnp.float32),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c))


def _splat_grid_fwd(gz, gy, gx, c, size: int, dot_bf16: bool):
    out = _splat_fwd_impl(gz, gy, gx, c, size, dot_bf16)
    return out, (gz, gy, gx, c)


def _splat_grid_bwd(size: int, dot_bf16: bool, residuals, g):
    gz, gy, gx, c = residuals
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _bwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dgz, dgy, dgx, dc = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec, vec_spec, vec_spec, vec_spec,
                  pl.BlockSpec((1, S, S, S), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[vec_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, 1, N), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c), g)
    return (dgz.reshape(B, N), dgy.reshape(B, N), dgx.reshape(B, N),
            dc.reshape(B, N))


_splat_grid.defvjp(_splat_grid_fwd, _splat_grid_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _splat_blur_grid(gz, gy, gx, c, band, size: int, dot_bf16: bool):
    return _splat_blur_fwd_impl(gz, gy, gx, c, band, size, dot_bf16)


def _splat_blur_fwd_impl(gz, gy, gx, c, band, size: int, dot_bf16: bool):
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _fused_fwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec] * 4 + [
            pl.BlockSpec((S, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, S, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, S, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, S, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c), band)


def _splat_blur_grid_fwd(gz, gy, gx, c, band, size: int, dot_bf16: bool):
    out = _splat_blur_fwd_impl(gz, gy, gx, c, band, size, dot_bf16)
    return out, (gz, gy, gx, c, band)


def _splat_blur_grid_bwd(size: int, dot_bf16: bool, residuals, g):
    gz, gy, gx, c, band = residuals
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _fused_bwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dgz, dgy, dgx, dc = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec] * 4 + [
            pl.BlockSpec((S, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S, S), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vec_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, 1, N), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((S, S, S), jnp.float32),
            pltpu.VMEM((S, S, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c), band, g)
    # sigma schedules are not trained: the band-matrix cotangent is zero by
    # contract (documented in splat_blur_pallas)
    return (dgz.reshape(B, N), dgy.reshape(B, N), dgx.reshape(B, N),
            dc.reshape(B, N), jnp.zeros_like(band))


_splat_blur_grid.defvjp(_splat_blur_grid_fwd, _splat_blur_grid_bwd)


def trilinear_splat_pallas(
    points: jnp.ndarray,
    size: int,
    weights: jnp.ndarray | None = None,
    border_eps: float = 1e-6,
    dot_bf16: bool = True,
) -> jnp.ndarray:
    """Drop-in replacement for ``ops.voxel.trilinear_splat`` (MXU kernel).

    Args/semantics identical: (B, N, 3) points in [-0.5, 0.5] (z, y, x) order,
    optional (B, N) weights, returns (B, S, S, S) clamped to [0, 1].
    ``dot_bf16`` runs the slab matmuls in bf16 with f32 accumulation
    (~0.2% max weight error; set False for f32 parity).
    """
    B, N, _ = points.shape
    S = int(size)

    grid = (S - 1) * (points + 0.5)  # (B, N, 3)
    in_bounds = jnp.all(
        (points > -0.5 + border_eps) & (points < 0.5 - border_eps), axis=-1
    )
    c = in_bounds.astype(points.dtype)
    if weights is not None:
        c = c * weights

    n_pad = _round_up(max(N, _LANES), _LANES)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N)]
        grid = jnp.pad(grid, pad + [(0, 0)])
        # padded points get weight 0 and a safely in-range coordinate
        c = jnp.pad(c, pad)

    gz = grid[..., 0]
    gy = grid[..., 1]
    gx = grid[..., 2]
    # Culled/padded points may carry wild coordinates; pin them to 0 so the
    # hat windows stay benign (their weight c is already 0).
    safe = (c > 0).astype(grid.dtype)
    gz, gy, gx = gz * safe, gy * safe, gx * safe

    vox = _splat_grid(gz, gy, gx, c, S, dot_bf16)
    return jnp.clip(vox, 0.0, 1.0)


def splat_blur_pallas(
    points: jnp.ndarray,
    size: int,
    sigma: jnp.ndarray,
    scale: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    kernel_size: int = 21,
    border_eps: float = 1e-6,
    dot_bf16: bool = True,
) -> jnp.ndarray:
    """Fused splat -> clamp -> Gaussian blur -> * scale -> clamp (one kernel).

    Equivalent to ``clip(gaussian_blur_3d(trilinear_splat(...), sigma) *
    scale)`` but the S^3 grid never round-trips through HBM between the splat
    and the blur stages — at chairs scale the three standalone blur matmul
    passes cost ~20 ms/step of pure HBM traffic.

    Constraints (asserted/by contract):
    * the blur kernel is symmetric (Gaussian), so the band matrix is
      symmetric and the fused backward can reuse it as its own transpose;
    * ``sigma`` is treated as non-differentiable (it is a training schedule,
      reference ``training_test_shape_net.py:21-29``) — its cotangent is 0;
    * ``scale`` IS differentiable (the decoder's scale head).
    """
    from im23d_tpu.ops.voxel import _band_matrix, gaussian_kernel_1d

    B, N, _ = points.shape
    S = int(size)

    grid = (S - 1) * (points + 0.5)
    in_bounds = jnp.all(
        (points > -0.5 + border_eps) & (points < 0.5 - border_eps), axis=-1
    )
    c = in_bounds.astype(points.dtype)
    if weights is not None:
        c = c * weights

    n_pad = _round_up(max(N, _LANES), _LANES)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N)]
        grid = jnp.pad(grid, pad + [(0, 0)])
        c = jnp.pad(c, pad)

    gz, gy, gx = grid[..., 0], grid[..., 1], grid[..., 2]
    safe = (c > 0).astype(grid.dtype)
    gz, gy, gx = gz * safe, gy * safe, gx * safe

    band = _band_matrix(gaussian_kernel_1d(sigma, kernel_size), S)
    # Pallas kernel: splat + clamp + Y/X blur (grid stays in VMEM).  The Z
    # blur, per-cloud scale and final clamp run as one XLA matmul pass with
    # a fused epilogue; its gradient (incl. dscale) comes from autodiff.
    yx = _splat_blur_grid(gz, gy, gx, c, jax.lax.stop_gradient(band),
                          S, dot_bf16)
    z = jax.lax.dot_general(
        band.astype(yx.dtype), yx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Z', B, Y, X)
    z = jnp.moveaxis(z, 0, 1)
    scale = jnp.broadcast_to(scale.reshape(-1), (B,)).astype(jnp.float32)
    return jnp.clip(z * scale.reshape(B, 1, 1, 1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Full projection kernel: splat -> clip -> 3-D blur -> scale -> termination
# probabilities -> depth-sum silhouette, one pallas_call per direction.
#
# The S^3 grid exists only in VMEM; HBM sees the (N,) point rows in and the
# (S, S) silhouette out — a 64x write reduction vs materializing the grid,
# and it subsumes the z-blur / clamp / log / cumsum / exp / reduce XLA passes
# (~20 ms/step at chairs scale) and their backward counterparts.
# ---------------------------------------------------------------------------


def _zblur_ref_to(dst_ref, src_ref, band_ref, scale, clamp, *, size,
                  dot_dtype):
    """Z blur reading from ``src_ref``: dst[z'] = sum_z band[z',z] src[z]
    (optionally * scale, clamped to <= 1).

    A dim-0 contraction of the (Z, Y, X) grid needs a vector shape-cast
    Mosaic does not support, and dynamic indexing of the band's lane axis
    is unprovable alignment — so the blur runs as S static per-y-plane MXU
    matmuls ``band @ src[:, y, :]`` (static strided slices only).
    """
    S = size
    b = band_ref[:].astype(dot_dtype)
    prec = _precision(dot_dtype)
    for y in range(S):
        sl = src_ref[:, y, :].astype(dot_dtype)  # (Z, X) plane at fixed y
        acc = jax.lax.dot_general(
            b, sl, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = acc * scale
        if clamp:
            acc = jnp.minimum(acc, 1.0)  # operands >= 0: only the top binds
        dst_ref[:, y, :] = acc


def _proj_fwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, band_ref, scale_ref,
                     out_ref, a_ref, b_ref, *, size: int, dot_dtype,
                     z_chunk: int, eps: float):
    S = size
    scale = scale_ref[0, 0, 0]
    _splat_to(a_ref, gz_ref, gy_ref, gx_ref, c_ref, size=S,
              dot_dtype=dot_dtype, z_chunk=z_chunk)
    v = jnp.minimum(a_ref[:], 1.0)    # splat output >= 0 by construction
    a_ref[:] = _blur_yx_in_vmem(v, band_ref[:], dot_dtype)
    # b <- clamp(scale * zblur(a)): the smoothed, scaled occupancies
    _zblur_ref_to(b_ref, a_ref, band_ref, scale, True, size=S,
                  dot_dtype=dot_dtype)

    # termination probs + depth sum, sequential over z with (S, S) carries
    def body(z, carry):
        sil, cum = carry
        o = jnp.clip(b_ref[z], eps, 1.0 - eps)
        exponent = jnp.where(z == 0, eps, cum) + jnp.log(o)
        return sil + jnp.exp(exponent), cum + jnp.log1p(-o)

    sil, _ = jax.lax.fori_loop(
        0, S, body,
        (jnp.zeros((S, S), jnp.float32), jnp.zeros((S, S), jnp.float32)),
    )
    # vertical flip happens outside the kernel (Mosaic has no rev)
    out_ref[0] = sil


def _proj_bwd_kernel(gz_ref, gy_ref, gx_ref, c_ref, band_ref, scale_ref,
                     g_ref, dgz_ref, dgy_ref, dgx_ref, dc_ref, ds_ref,
                     a_ref, b_ref, p_ref, *, size: int, dot_dtype,
                     z_chunk: int, eps: float):
    """VJP: recompute the whole forward in VMEM, then push the silhouette
    cotangent back through termination -> scale/clamp -> blur^T -> clamp ->
    splat^T.  Scratch: a = raw splat grid (kept for the clamp mask),
    b = Y/X-blurred grid, later the du cotangent, p = scaled occupancies,
    later the termination probs."""
    S = size
    N = gz_ref.shape[-1]
    ZC = z_chunk
    scale = scale_ref[0, 0, 0]

    # ---- recompute forward ------------------------------------------------
    _splat_to(a_ref, gz_ref, gy_ref, gx_ref, c_ref, size=S,
              dot_dtype=dot_dtype, z_chunk=ZC)
    b_ref[:] = _blur_yx_in_vmem(jnp.minimum(a_ref[:], 1.0), band_ref[:],
                                dot_dtype)
    # p <- zb = zblur(b), unscaled and unclamped (needed for dscale)
    _zblur_ref_to(p_ref, b_ref, band_ref, 1.0, False, size=S,
                  dot_dtype=dot_dtype)

    # pass 1: termination probs p_z overwrite b; their total + gsil kept
    gsil = g_ref[0]  # caller already undid the vertical flip

    def fwd_body(z, carry):
        ptot, cum = carry
        u = p_ref[z] * scale
        o = jnp.clip(jnp.minimum(u, 1.0), eps, 1.0 - eps)
        pz = jnp.exp(jnp.where(z == 0, eps, cum) + jnp.log(o))
        b_ref[z] = pz
        return ptot + pz, cum + jnp.log1p(-o)

    ptot, _ = jax.lax.fori_loop(
        0, S, fwd_body,
        (jnp.zeros((S, S), jnp.float32), jnp.zeros((S, S), jnp.float32)),
    )

    # pass 2: dL/dlog_occ_z = gsil * p_z; dL/dlog_vac_j = gsil * (ptot -
    # pcum_j) (every p_z with z > j contains cum_{z-1} which contains
    # log_vac_j); fold through the clip/scale chain into du_z, overwrite b
    def bwd_body(z, carry):
        pcum, ds_acc = carry
        pz = b_ref[z]
        pcum = pcum + pz
        zb = p_ref[z]
        u = zb * scale
        sv = jnp.minimum(u, 1.0)
        o = jnp.clip(sv, eps, 1.0 - eps)
        mask = ((u <= 1.0) & (sv >= eps) & (sv <= 1.0 - eps)).astype(
            jnp.float32
        )
        do = gsil * pz / o - gsil * (ptot - pcum) / (1.0 - o)
        du = do * mask
        b_ref[z] = du
        return pcum, ds_acc + jnp.sum(du * zb)

    _, ds_val = jax.lax.fori_loop(
        0, S, bwd_body,
        (jnp.zeros((S, S), jnp.float32), jnp.float32(0.0)),
    )

    # dzb = du * scale; dvyx = zblur^T(dzb) = zblur(dzb) (band symmetric)
    _zblur_ref_to(p_ref, b_ref, band_ref, scale, False, size=S,
                  dot_dtype=dot_dtype)
    dv = _blur_yx_transpose_in_vmem(p_ref[:], band_ref[:], dot_dtype)
    # min(vox, 1) mask (lax.min passes the gradient on ties, hence <=)
    b_ref[:] = dv * (a_ref[:] <= 1.0).astype(jnp.float32)

    # ---- splat backward against b (same contraction as _bwd_kernel) ------
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0).astype(jnp.float32)
    dy = iota - gy_ref[0, 0][None, :]
    dx = iota - gx_ref[0, 0][None, :]
    hat_dy = _hat(dy)
    hatp_dy = _hat_grad(dy)
    hatp_dx = _hat_grad(dx)
    wy_d = hat_dy.astype(dot_dtype)
    wx_d = _hat(dx).astype(dot_dtype)
    gz = gz_ref[0, 0][None, :]
    c = c_ref[0, 0][None, :]

    def body(zc, carry):
        dgz, dgy, dgx, dc = carry
        z0 = zc * ZC
        g_c = b_ref[pl.ds(z0, ZC)].astype(dot_dtype)
        dz = gz[None] - (
            jax.lax.broadcasted_iota(jnp.int32, (ZC, 1, N), 0).astype(
                jnp.float32
            )
            + z0.astype(jnp.float32)
        )
        hz = _hat(dz)[:, 0]
        hzp = _hat_grad(dz)[:, 0]
        m = jax.lax.dot_general(
            g_c, wx_d, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        t0 = jnp.sum(hat_dy[None] * m, axis=1)
        t1 = jnp.sum(hatp_dy[None] * m, axis=1)
        p = jax.lax.dot_general(
            g_c, wy_d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dot_dtype),
        )
        t2 = jnp.sum(hatp_dx[None] * p, axis=1)
        dgz = dgz + jnp.sum(hzp * t0, axis=0, keepdims=True) * c
        dgy = dgy - jnp.sum(hz * t1, axis=0, keepdims=True) * c
        dgx = dgx - jnp.sum(hz * t2, axis=0, keepdims=True) * c
        dc = dc + jnp.sum(hz * t0, axis=0, keepdims=True)
        return dgz, dgy, dgx, dc

    zero = jnp.zeros((1, N), jnp.float32)
    dgz, dgy, dgx, dc = jax.lax.fori_loop(
        0, S // ZC, body, (zero, zero, zero, zero)
    )
    dgz_ref[0] = dgz
    dgy_ref[0] = dgy
    dgx_ref[0] = dgx
    dc_ref[0] = dc
    ds_ref[0] = jnp.full(ds_ref.shape[1:], ds_val)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _proj_grid(gz, gy, gx, c, band, scale, size: int, dot_bf16: bool,
               eps: float):
    return _proj_fwd_impl(gz, gy, gx, c, band, scale, size, dot_bf16, eps)


def _proj_fwd_impl(gz, gy, gx, c, band, scale, size: int, dot_bf16: bool,
                   eps: float):
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _proj_fwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk,
        eps=eps,
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec] * 4 + [
            pl.BlockSpec((S, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
            vec_spec,
        ],
        out_specs=pl.BlockSpec((1, S, S), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, S, S), jnp.float32),
            pltpu.VMEM((S, S, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c), band,
      vec(jnp.broadcast_to(scale[:, None], (B, N))))
    return out[:, ::-1]  # vertical flip (project_silhouette parity)


def _proj_grid_fwd(gz, gy, gx, c, band, scale, size: int, dot_bf16: bool,
                   eps: float):
    out = _proj_fwd_impl(gz, gy, gx, c, band, scale, size, dot_bf16, eps)
    return out, (gz, gy, gx, c, band, scale)


def _proj_grid_bwd(size: int, dot_bf16: bool, eps: float, residuals, g):
    gz, gy, gx, c, band, scale = residuals
    B, N = gz.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = 4 if S % 4 == 0 else 1
    kernel = functools.partial(
        _proj_bwd_kernel, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk,
        eps=eps,
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    dgz, dgy, dgx, dc, ds = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vec_spec] * 4 + [
            pl.BlockSpec((S, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
            vec_spec,
            pl.BlockSpec((1, S, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vec_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((B, 1, N), jnp.float32)] * 5,
        scratch_shapes=[
            pltpu.VMEM((S, S, S), jnp.float32),
            pltpu.VMEM((S, S, S), jnp.float32),
            pltpu.VMEM((S, S, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(vec(gz), vec(gy), vec(gx), vec(c), band,
      vec(jnp.broadcast_to(scale[:, None], (B, N))), g[:, ::-1])
    # band (sigma schedule) is non-differentiable by contract
    return (dgz.reshape(B, N), dgy.reshape(B, N), dgx.reshape(B, N),
            dc.reshape(B, N), jnp.zeros_like(band), ds[:, 0, 0])


_proj_grid.defvjp(_proj_grid_fwd, _proj_grid_bwd)


def _prep_projection(points, size: int, weights, border_eps: float):
    """Shared projection preprocessing: voxel-grid coords + splat weights.

    ``points`` is either a (B, N, 3) array or a tuple of three (B, N)
    component planes (z, y, x).  Callers on the hot path pass the planar
    form (``world_to_camera_zyx``): it avoids the stack+strided-slice
    roundtrip, which both costs an interleaved-layout copy and triggered
    an XLA:TPU fusion miscompile at candidate-sweep scale (collapsed row
    stride reading the broadcast cam buffer — gz silently corrupted for
    every row > 0).

    Returns lane-padded (gz, gy, gx, c); culled / zero-weight points get
    zeroed coordinates so their hat windows stay benign.
    """
    if isinstance(points, (tuple, list)):
        pz, py, px = points
    else:
        pz, py, px = points[..., 0], points[..., 1], points[..., 2]
    B, N = pz.shape
    S = int(size)

    lo, hi = -0.5 + border_eps, 0.5 - border_eps
    in_bounds = ((pz > lo) & (pz < hi) & (py > lo) & (py < hi)
                 & (px > lo) & (px < hi))
    c = in_bounds.astype(pz.dtype)
    if weights is not None:
        c = c * weights
    safe = (c > 0).astype(pz.dtype)
    comps = [(S - 1) * (p + 0.5) * safe for p in (pz, py, px)]

    # pad to the windowed kernels' block width so block windows tile N
    n_pad = _round_up(max(N, _LANES), max(_LANES, _sorted_blk()))
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N)]
        comps = [jnp.pad(g, pad) for g in comps]
        c = jnp.pad(c, pad)

    gz, gy, gx = comps
    return gz, gy, gx, c


def _projection_band(sigma, size: int, kernel_size: int):
    from im23d_tpu.ops.voxel import _band_matrix, gaussian_kernel_1d

    return jax.lax.stop_gradient(
        _band_matrix(gaussian_kernel_1d(sigma, kernel_size), size)
    )


def projection_silhouette_pallas(
    points: jnp.ndarray,
    size: int,
    sigma: jnp.ndarray,
    scale: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    kernel_size: int = 21,
    border_eps: float = 1e-6,
    eps: float = 1e-5,
    dot_bf16: bool = True,
    sorted_blocks: bool = True,
    need_weight_grad: bool = True,
) -> jnp.ndarray:
    """Whole rendering-free projection as one Pallas kernel: (B, S, S)
    silhouettes from (B, N, 3) camera-space points.

    Equivalent to ``project_silhouette(termination_probs(gaussian_blur_3d(
    trilinear_splat(points, S, weights), sigma, scale=scale)))`` with the S^3
    grid living only in VMEM.  Same contracts as ``splat_blur_pallas``
    (symmetric kernel; sigma non-differentiable; scale differentiable).
    ``sorted_blocks`` selects the z-sorted block-windowed splat (~10x fewer
    contraction FLOPs; see the section comment below) over the dense one.
    ``need_weight_grad=False`` declares ``weights`` a non-differentiable
    constant (e.g. a dropout mask): the sorted path then skips carrying its
    cotangent through the backward unsort and returns zeros for it.
    """
    S = int(size)
    gz, gy, gx, c = _prep_projection(points, S, weights, border_eps)
    B = gz.shape[0]
    band = _projection_band(sigma, S, kernel_size)
    scale = jnp.broadcast_to(scale.reshape(-1), (B,)).astype(jnp.float32)
    if sorted_blocks:
        return _proj_sorted_grid(gz, gy, gx, c, band, scale, S, dot_bf16,
                                 float(eps), bool(need_weight_grad))
    return _proj_grid(gz, gy, gx, c, band, scale, S, dot_bf16, float(eps))


# ---------------------------------------------------------------------------
# Z-sorted block-windowed projection kernel.
#
# The dense splat contracts all N points for every z-chunk although only
# points with gz within 1 cell of the chunk have nonzero hat weights
# (~(ZC+2)/S of them, ~9% at chairs scale) — a 10x FLOP redundancy.  Here
# points are sorted by gz outside the kernel (lax.sort, differentiation-free
# permutation), per-chunk 128-point block windows are found by searchsorted
# and passed through SMEM, and each chunk contracts only its window via a
# dynamic-bound fori_loop over lane-aligned blocks.  Culled points carry a
# sentinel key so they sort to the tail and fall outside every window.
# ---------------------------------------------------------------------------

_Z_SENTINEL = 4096.0  # sort key for culled points: beyond any chunk window


def _sorted_z_chunk(size: int) -> int:
    # measured on v5e at chairs scale: ZC=8 widens each chunk's point window
    # more than it saves in loop trips; ZC=4 is the sweet spot.
    # IM23D_SPLAT_ZC overrides for experiments (read at trace time — set it
    # before the first jit of a process).
    override = int(os.environ.get("IM23D_SPLAT_ZC", "0"))
    if override and size % override == 0:
        return override
    for zc in (4, 2):
        if size % zc == 0:
            return zc
    return 1


def _sorted_blk() -> int:
    """Lane width of the windowed kernels' contraction blocks (and of the
    block-window granularity).  IM23D_SPLAT_BLK overrides (multiple of 128;
    read at trace time) — at high keep-prob p the per-chunk windows span
    many 128-lane blocks and wider blocks halve the loop-trip count."""
    blk = int(os.environ.get("IM23D_SPLAT_BLK", str(_LANES)))
    assert blk % _LANES == 0, blk
    return blk


def _splat_sorted_to(vox_ref, gz_ref, gy_ref, gx_ref, c_ref, blo_ref,
                     bhi_ref, prog, *, size, dot_dtype, z_chunk):
    """Windowed splat of z-sorted points: writes the raw grid to vox_ref."""
    S = size
    ZC = z_chunk
    BLK = _sorted_blk()
    prec = _precision(dot_dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0).astype(
        jnp.float32
    )
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (ZC, 1, BLK), 0).astype(
        jnp.float32
    )

    def chunk_body(zc, _):
        z0 = zc * ZC

        def blk_body(b, acc):
            sl = pl.ds(b * BLK, BLK)
            gyb = gy_ref[0, 0, sl][None, :]
            gxb = gx_ref[0, 0, sl][None, :]
            cb = c_ref[0, 0, sl][None, :]
            wyb = _hat(iota - gyb).astype(dot_dtype)       # (S, BLK)
            wxb = _hat(iota - gxb).astype(dot_dtype)
            dz = gz_ref[0, 0, sl][None, None] - (
                iota_z + z0.astype(jnp.float32)
            )
            hz = (_hat(dz) * cb[None]).astype(dot_dtype)   # (ZC, 1, BLK)
            a = (wyb[None] * hz).reshape(ZC * S, BLK)
            return acc + jax.lax.dot_general(
                a, wxb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        acc = jax.lax.fori_loop(
            blo_ref[prog, zc], bhi_ref[prog, zc], blk_body,
            jnp.zeros((ZC * S, S), jnp.float32),
        )
        vox_ref[pl.ds(z0, ZC)] = acc.reshape(ZC, S, S)
        return 0

    jax.lax.fori_loop(0, S // ZC, chunk_body, 0)


def _splat_sorted_bwd_accum(dvox_ref, gz_ref, gy_ref, gx_ref, c_ref,
                            blo_ref, bhi_ref, dgz_ref, dgy_ref, dgx_ref,
                            dc_ref, prog, *, size, dot_dtype, z_chunk):
    """Transpose of the windowed splat: per-point cotangents from the grid
    cotangent held in ``dvox_ref`` (same contractions as _bwd_kernel, block
    windows instead of all-N)."""
    S = size
    ZC = z_chunk
    BLK = _sorted_blk()
    N = gz_ref.shape[-1]
    prec = _precision(dot_dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0).astype(
        jnp.float32
    )
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (ZC, 1, BLK), 0).astype(
        jnp.float32
    )

    zeros = jnp.zeros((N,), jnp.float32)
    dgz_ref[0, 0] = zeros
    dgy_ref[0, 0] = zeros
    dgx_ref[0, 0] = zeros
    dc_ref[0, 0] = zeros

    def chunk_body(zc, _):
        z0 = zc * ZC
        g_c = dvox_ref[pl.ds(z0, ZC)].astype(dot_dtype)   # (ZC, S, S)

        def blk_body(b, _):
            sl = pl.ds(b * BLK, BLK)
            gyb = gy_ref[0, 0, sl][None, :]
            gxb = gx_ref[0, 0, sl][None, :]
            cb = c_ref[0, 0, sl]
            dy = iota - gyb
            dx = iota - gxb
            hat_dy = _hat(dy)
            hatp_dy = _hat_grad(dy)
            hatp_dx = _hat_grad(dx)
            wy_d = hat_dy.astype(dot_dtype)
            wx_d = _hat(dx).astype(dot_dtype)
            dz = gz_ref[0, 0, sl][None, None] - (
                iota_z + z0.astype(jnp.float32)
            )
            hz = _hat(dz)[:, 0]                            # (ZC, BLK)
            hzp = _hat_grad(dz)[:, 0]
            m = jax.lax.dot_general(
                g_c, wx_d, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )                                              # (ZC, S, BLK)
            t0 = jnp.sum(hat_dy[None] * m, axis=1)         # (ZC, BLK)
            t1 = jnp.sum(hatp_dy[None] * m, axis=1)
            p = jax.lax.dot_general(
                g_c, wy_d, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            t2 = jnp.sum(hatp_dx[None] * p, axis=1)
            dgz_ref[0, 0, sl] = (
                dgz_ref[0, 0, sl] + jnp.sum(hzp * t0, axis=0) * cb
            )
            dgy_ref[0, 0, sl] = (
                dgy_ref[0, 0, sl] - jnp.sum(hz * t1, axis=0) * cb
            )
            dgx_ref[0, 0, sl] = (
                dgx_ref[0, 0, sl] - jnp.sum(hz * t2, axis=0) * cb
            )
            dc_ref[0, 0, sl] = dc_ref[0, 0, sl] + jnp.sum(hz * t0, axis=0)
            return 0

        jax.lax.fori_loop(blo_ref[prog, zc], bhi_ref[prog, zc], blk_body, 0)
        return 0

    jax.lax.fori_loop(0, S // ZC, chunk_body, 0)


def _proj_sorted_fwd_kernel(blo_ref, bhi_ref, gz_ref, gy_ref, gx_ref, c_ref,
                            band_ref, scale_ref, out_ref, a_ref, b_ref, *,
                            size: int, dot_dtype, z_chunk: int, eps: float):
    S = size
    scale = scale_ref[0, 0, 0]
    prog = pl.program_id(0)
    _splat_sorted_to(a_ref, gz_ref, gy_ref, gx_ref, c_ref, blo_ref, bhi_ref,
                     prog, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk)
    v = jnp.minimum(a_ref[:], 1.0)
    a_ref[:] = _blur_yx_in_vmem(v, band_ref[:], dot_dtype)
    _zblur_ref_to(b_ref, a_ref, band_ref, scale, True, size=S,
                  dot_dtype=dot_dtype)

    # termination probs + depth sum, 8-plane slabs with batched
    # transcendentals (a plane-at-a-time loop is latency-bound: 64 scalar-
    # carried iterations of (S, S) work)
    TC = 8 if S % 8 == 0 else 1

    def body(zc, carry):
        sil, cum = carry
        slab = b_ref[pl.ds(zc * TC, TC)]                  # (TC, S, S)
        o = jnp.clip(slab, eps, 1.0 - eps)
        lo = jnp.log(o)
        lv = jnp.log1p(-o)
        pres = []
        for i in range(TC):
            pres.append(cum)
            cum = cum + lv[i]
        expo = jnp.stack(pres) + lo                        # (TC, S, S)
        first = jnp.full((S, S), eps, jnp.float32)
        expo = jnp.where(
            (zc == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (TC, 1, 1), 0) == 0),
            first[None] + lo, expo,
        )
        return sil + jnp.sum(jnp.exp(expo), axis=0), cum

    sil, _ = jax.lax.fori_loop(
        0, S // TC, body,
        (jnp.zeros((S, S), jnp.float32), jnp.zeros((S, S), jnp.float32)),
    )
    out_ref[0] = sil


def _proj_sorted_bwd_kernel(blo_ref, bhi_ref, gz_ref, gy_ref, gx_ref, c_ref,
                            band_ref, scale_ref, g_ref, dgz_ref, dgy_ref,
                            dgx_ref, dc_ref, ds_ref, a_ref, b_ref, p_ref, *,
                            size: int, dot_dtype, z_chunk: int, eps: float):
    """Same structure as _proj_bwd_kernel with windowed splat/splat^T."""
    S = size
    scale = scale_ref[0, 0, 0]
    prog = pl.program_id(0)

    _splat_sorted_to(a_ref, gz_ref, gy_ref, gx_ref, c_ref, blo_ref, bhi_ref,
                     prog, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk)
    b_ref[:] = _blur_yx_in_vmem(jnp.minimum(a_ref[:], 1.0), band_ref[:],
                                dot_dtype)
    _zblur_ref_to(p_ref, b_ref, band_ref, 1.0, False, size=S,
                  dot_dtype=dot_dtype)

    gsil = g_ref[0]
    TC = 8 if S % 8 == 0 else 1

    def fwd_body(zc, carry):
        ptot, cum = carry
        u = p_ref[pl.ds(zc * TC, TC)] * scale              # (TC, S, S)
        o = jnp.clip(jnp.minimum(u, 1.0), eps, 1.0 - eps)
        lo = jnp.log(o)
        lv = jnp.log1p(-o)
        pres = []
        for i in range(TC):
            pres.append(cum)
            cum = cum + lv[i]
        expo = jnp.stack(pres) + lo
        first = jnp.full((S, S), eps, jnp.float32)
        expo = jnp.where(
            (zc == 0)
            & (jax.lax.broadcasted_iota(jnp.int32, (TC, 1, 1), 0) == 0),
            first[None] + lo, expo,
        )
        pz = jnp.exp(expo)
        b_ref[pl.ds(zc * TC, TC)] = pz
        return ptot + jnp.sum(pz, axis=0), cum

    ptot, _ = jax.lax.fori_loop(
        0, S // TC, fwd_body,
        (jnp.zeros((S, S), jnp.float32), jnp.zeros((S, S), jnp.float32)),
    )

    def bwd_body(zc, carry):
        pcum, ds_acc = carry
        pz = b_ref[pl.ds(zc * TC, TC)]
        zb = p_ref[pl.ds(zc * TC, TC)]
        u = zb * scale
        sv = jnp.minimum(u, 1.0)
        o = jnp.clip(sv, eps, 1.0 - eps)
        mask = ((u <= 1.0) & (sv >= eps) & (sv <= 1.0 - eps)).astype(
            jnp.float32
        )
        pcs = []
        for i in range(TC):
            pcum = pcum + pz[i]
            pcs.append(pcum)
        pcum_stack = jnp.stack(pcs)                        # (TC, S, S)
        do = (gsil[None] * pz / o
              - gsil[None] * (ptot[None] - pcum_stack) / (1.0 - o))
        du = do * mask
        b_ref[pl.ds(zc * TC, TC)] = du
        return pcum, ds_acc + jnp.sum(du * zb)

    _, ds_val = jax.lax.fori_loop(
        0, S // TC, bwd_body,
        (jnp.zeros((S, S), jnp.float32), jnp.float32(0.0)),
    )

    _zblur_ref_to(p_ref, b_ref, band_ref, scale, False, size=S,
                  dot_dtype=dot_dtype)
    dv = _blur_yx_transpose_in_vmem(p_ref[:], band_ref[:], dot_dtype)
    b_ref[:] = dv * (a_ref[:] <= 1.0).astype(jnp.float32)

    _splat_sorted_bwd_accum(b_ref, gz_ref, gy_ref, gx_ref, c_ref, blo_ref,
                            bhi_ref, dgz_ref, dgy_ref, dgx_ref, dc_ref, prog,
                            size=S, dot_dtype=dot_dtype, z_chunk=z_chunk)
    ds_ref[0] = jnp.full(ds_ref.shape[1:], ds_val)


def _sort_and_windows(gz, gy, gx, c, size: int, z_chunk: int,
                      with_perm: bool = True):
    """Sort points by gz (culled -> sentinel tail) + per-chunk block windows.

    Returns sorted (key, gy, gx, c), the permutation (for the backward
    unsort; ``None`` when ``with_perm`` is False — forward-only callers
    save a fifth operand riding through every bitonic stage), and int32
    (B, S//ZC) block bounds.
    """
    B, N = gz.shape
    key = jnp.where(c > 0, gz, jnp.float32(_Z_SENTINEL))
    if with_perm:
        perm0 = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (B, N)
        )
        key_s, gy_s, gx_s, c_s, perm = jax.lax.sort(
            (key, gy, gx, c, perm0), dimension=-1, num_keys=1
        )
    else:
        perm = None
        key_s, gy_s, gx_s, c_s = jax.lax.sort(
            (key, gy, gx, c), dimension=-1, num_keys=1
        )
    CH = size // z_chunk
    z0s = jnp.arange(CH, dtype=jnp.float32) * z_chunk
    # searchsorted(a, v, 'left') == #(a < v) on sorted rows; the direct
    # compare-count vectorizes on the VPU where jnp.searchsorted lowers to
    # a sequential while loop (~2 ms/step at chairs scale)
    lo = jnp.sum(key_s[:, :, None] < (z0s - 1.0), axis=1, dtype=jnp.int32)
    hi = jnp.sum(key_s[:, :, None] < (z0s + z_chunk), axis=1,
                 dtype=jnp.int32)
    blk = _sorted_blk()
    blo = (lo // blk).astype(jnp.int32)
    bhi = ((hi + blk - 1) // blk).astype(jnp.int32)
    return key_s, gy_s, gx_s, c_s, perm, blo, bhi


def _proj_sorted_call(kernel_fn, n_outs, key_s, gy_s, gx_s, c_s, band,
                      scale, blo, bhi, extra, size, dot_bf16, eps,
                      out_shapes, n_scratch):
    B, N = key_s.shape
    S = size
    dot_dtype = jnp.bfloat16 if dot_bf16 else jnp.float32
    z_chunk = _sorted_z_chunk(S)
    CH = S // z_chunk
    kernel = functools.partial(
        kernel_fn, size=S, dot_dtype=dot_dtype, z_chunk=z_chunk, eps=eps,
    )
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    # whole-array SMEM (blocked SMEM specs fail the tile-divisibility check
    # and a (B, 1, CH) block hangs Mosaic); kernels index rows with the
    # program id hoisted to kernel top level (interpret mode can't lower it
    # inside loop bodies)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem_spec, smem_spec] + [vec_spec] * 4 + [
        pl.BlockSpec((S, S), lambda b: (0, 0), memory_space=pltpu.VMEM),
        vec_spec,
    ]
    operands = [blo, bhi, vec(key_s), vec(gy_s), vec(gx_s), vec(c_s), band,
                vec(jnp.broadcast_to(scale[:, None], (B, N)))]
    if extra is not None:  # silhouette cotangent (backward only)
        in_specs.append(pl.BlockSpec((1, S, S), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(extra)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=(out_shapes[0][1] if n_outs == 1
                   else [s for _, s in out_shapes]),
        out_shape=(out_shapes[0][0] if n_outs == 1
                   else [s for s, _ in out_shapes]),
        scratch_shapes=[pltpu.VMEM((S, S, S), jnp.float32)] * n_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _proj_sorted_grid(gz, gy, gx, c, band, scale, size: int, dot_bf16: bool,
                      eps: float, need_dc: bool = True):
    # primal-only path (e.g. the stop-gradient candidate sweep): no backward
    # unsort ever happens, so skip sorting the permutation payload
    out, _ = _proj_sorted_fwd(gz, gy, gx, c, band, scale, size, dot_bf16,
                              eps, with_perm=False)
    return out


def _proj_sorted_fwd(gz, gy, gx, c, band, scale, size: int, dot_bf16: bool,
                     eps: float, with_perm: bool = True):
    B, N = gz.shape
    S = size
    key_s, gy_s, gx_s, c_s, perm, blo, bhi = _sort_and_windows(
        gz, gy, gx, c, S, _sorted_z_chunk(S), with_perm=with_perm
    )
    vec_spec = pl.BlockSpec((1, S, S), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = _proj_sorted_call(
        _proj_sorted_fwd_kernel, 1, key_s, gy_s, gx_s, c_s, band, scale,
        blo, bhi, None, S, dot_bf16, eps,
        [(jax.ShapeDtypeStruct((B, S, S), jnp.float32), vec_spec)], 2,
    )
    out = out[:, ::-1]  # vertical flip (project_silhouette parity)
    residuals = (key_s, gy_s, gx_s, c_s, perm, blo, bhi, band, scale)
    return out, residuals


def _proj_sorted_bwd(size: int, dot_bf16: bool, eps: float, need_dc: bool,
                     residuals, g):
    key_s, gy_s, gx_s, c_s, perm, blo, bhi, band, scale = residuals
    B, N = key_s.shape
    S = size
    vec = lambda x: x.reshape(B, 1, N)
    vec_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = [(jax.ShapeDtypeStruct((B, 1, N), jnp.float32), vec_spec)] * 5
    dgz_s, dgy_s, dgx_s, dc_s, ds = _proj_sorted_call(
        _proj_sorted_bwd_kernel, 5, key_s, gy_s, gx_s, c_s, band, scale,
        blo, bhi, g[:, ::-1], S, dot_bf16, eps, outs, 3,
    )
    # unsort: sorting by the forward permutation restores original order.
    # When the caller's weights are non-differentiable constants (dropout
    # masks), dc is dead downstream — skip carrying it through the unsort.
    if need_dc:
        _, dgz, dgy, dgx, dc = jax.lax.sort(
            (perm, dgz_s.reshape(B, N), dgy_s.reshape(B, N),
             dgx_s.reshape(B, N), dc_s.reshape(B, N)),
            dimension=-1, num_keys=1,
        )
    else:
        _, dgz, dgy, dgx = jax.lax.sort(
            (perm, dgz_s.reshape(B, N), dgy_s.reshape(B, N),
             dgx_s.reshape(B, N)),
            dimension=-1, num_keys=1,
        )
        dc = jnp.zeros((B, N), jnp.float32)
    return (dgz, dgy, dgx, dc, jnp.zeros_like(band), ds[:, 0, 0])


def _proj_sorted_fwd_rule(gz, gy, gx, c, band, scale, size, dot_bf16, eps,
                          need_dc):
    return _proj_sorted_fwd(gz, gy, gx, c, band, scale, size, dot_bf16, eps)


_proj_sorted_grid.defvjp(_proj_sorted_fwd_rule, _proj_sorted_bwd)


# ---------------------------------------------------------------------------
# Winner reuse: the ensemble min-loss projects every pose candidate forward
# (stop-gradient) and then re-projects only the argmin winners
# differentiably.  The winners' forward outputs and sorted rows already
# exist in the candidate sweep, so the "re-projection" needs no forward
# kernel and no fresh sort: `projection_silhouette_products` exposes the
# sweep's sorted rows/windows, and `projection_silhouette_reuse` re-attaches
# gradients to gathered winner rows — forward is the (already computed)
# silhouette, backward is the usual recompute-in-VMEM kernel on those rows.
# ---------------------------------------------------------------------------


def projection_silhouette_products(
    points: jnp.ndarray,
    size: int,
    sigma: jnp.ndarray,
    scale: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    kernel_size: int = 21,
    border_eps: float = 1e-6,
    eps: float = 1e-5,
    dot_bf16: bool = True,
):
    """Primal-only projection that also returns its sorted rows + windows.

    Same silhouettes as ``projection_silhouette_pallas`` (sorted path), plus
    ``products = (key_s, gy_s, gx_s, c_s, perm, blo, bhi)`` — per-row sorted
    coordinates/weights, the sort permutation, and the per-chunk block
    windows.  Rows of ``products`` can be gathered and handed to
    ``projection_silhouette_reuse``.  Callers should pass stop-gradient
    inputs (this function defines no VJP of its own).
    """
    S = int(size)
    gz, gy, gx, c = _prep_projection(points, S, weights, border_eps)
    B = gz.shape[0]
    band = _projection_band(sigma, S, kernel_size)
    scale = jnp.broadcast_to(scale.reshape(-1), (B,)).astype(jnp.float32)
    out, residuals = _proj_sorted_fwd(gz, gy, gx, c, band, scale, S,
                                      dot_bf16, float(eps), with_perm=True)
    key_s, gy_s, gx_s, c_s, perm, blo, bhi, _, _ = residuals
    return out, (key_s, gy_s, gx_s, c_s, perm, blo, bhi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _proj_sorted_reuse(gz, gy, gx, c, band, scale, sil, products,
                       size: int, dot_bf16: bool, eps: float):
    return sil


def _proj_sorted_reuse_fwd(gz, gy, gx, c, band, scale, sil, products,
                           size, dot_bf16, eps):
    key_s, gy_s, gx_s, c_s, perm, blo, bhi = products
    residuals = (key_s, gy_s, gx_s, c_s, perm, blo, bhi, band, scale)
    return sil, residuals


def _zero_cotangent(a):
    # integer primals (perm / block windows) take float0 cotangents
    if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
        return np.zeros(a.shape, jax.dtypes.float0)
    return jnp.zeros_like(a)


def _proj_sorted_reuse_bwd(size, dot_bf16, eps, residuals, g):
    dgz, dgy, dgx, dc, dband, ds = _proj_sorted_bwd(
        size, dot_bf16, eps, False, residuals, g
    )
    dproducts = tuple(_zero_cotangent(a) for a in residuals[:7])
    return (dgz, dgy, dgx, dc, dband, ds, g, dproducts)


_proj_sorted_reuse.defvjp(_proj_sorted_reuse_fwd, _proj_sorted_reuse_bwd)


def projection_silhouette_reuse(
    points: jnp.ndarray,
    size: int,
    sigma: jnp.ndarray,
    scale: jnp.ndarray,
    sil: jnp.ndarray,
    products,
    weights: jnp.ndarray | None = None,
    kernel_size: int = 21,
    border_eps: float = 1e-6,
    eps: float = 1e-5,
    dot_bf16: bool = True,
) -> jnp.ndarray:
    """Differentiable winner projection without a forward kernel.

    ``sil``/``products`` are (gathered rows of) a
    ``projection_silhouette_products`` sweep whose inputs were numerically
    identical to ``points``/``scale``/``weights`` here — the forward value
    IS ``sil``; the VJP runs the windowed backward kernel on the presorted
    rows and unsorts the cotangents onto ``points``.  ``weights`` is
    treated as a non-differentiable constant (dropout-mask semantics).
    XLA dead-code-eliminates the unused forward recomputation of the
    camera/grid chain, so only its backward ops survive.
    """
    S = int(size)
    gz, gy, gx, c = _prep_projection(points, S, weights, border_eps)
    B = gz.shape[0]
    band = _projection_band(sigma, S, kernel_size)
    scale = jnp.broadcast_to(scale.reshape(-1), (B,)).astype(jnp.float32)
    return _proj_sorted_reuse(gz, gy, gx, c, band, scale, sil, products,
                              S, dot_bf16, float(eps))
