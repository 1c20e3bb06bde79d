"""Chamfer distance between point clouds (XLA + Pallas TPU kernel).

The reference computes no Chamfer anywhere (SURVEY.md §6) although the paper
reports it; BASELINE.json requires a Chamfer evaluator for ShapeNet.  Both
directions of nearest-neighbor squared distance, O(N*M) pairwise, computed
in tiles so the (N, M) distance matrix never hits HBM.

``chamfer_distance`` is the symmetric Chamfer-L2:
``mean_n min_m ||a_n - b_m||^2 + mean_m min_n ||a_m - b_n||^2``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------- XLA path


def nn_dist2_xla(x: jnp.ndarray, y: jnp.ndarray, m_chunk: int = 2048) -> jnp.ndarray:
    """(B, N) squared distance of each x point to its nearest y point."""
    B, N, _ = x.shape
    M = y.shape[1]
    mc = min(m_chunk, M)
    n_chunks = -(-M // mc)
    M_pad = n_chunks * mc
    if M_pad != M:
        pad = jnp.full((B, M_pad - M, 3), 1e9, y.dtype)
        y = jnp.concatenate([y, pad], axis=1)
    y_c = y.reshape(B, n_chunks, mc, 3).transpose(1, 0, 2, 3)
    x2 = jnp.sum(x * x, axis=-1)  # (B, N)

    def step(best, yc):
        y2 = jnp.sum(yc * yc, axis=-1)  # (B, mc)
        xy = jnp.einsum("bnd,bmd->bnm", x, yc)
        d2 = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    init = jnp.full((B, N), jnp.inf, x.dtype)
    best, _ = jax.lax.scan(step, init, y_c)
    return jnp.maximum(best, 0.0)


# -------------------------------------------------------------- Pallas path


def _nn_kernel(x_ref, y_ref, out_ref, *, m_tile: int, m_total: int):
    # x_ref: (1, 3, Nt) — coords transposed so points sit on lanes
    # y_ref: (1, 3, M)
    xz = x_ref[0, 0][None, :]  # (1, Nt)
    xy_ = x_ref[0, 1][None, :]
    xx = x_ref[0, 2][None, :]

    def body(mi, best):
        y0 = y_ref[0, 0, pl.ds(mi * m_tile, m_tile)]  # (m_tile,)
        y1 = y_ref[0, 1, pl.ds(mi * m_tile, m_tile)]
        y2 = y_ref[0, 2, pl.ds(mi * m_tile, m_tile)]
        dz = y0[:, None] - xz  # (m_tile, Nt)
        dy = y1[:, None] - xy_
        dx = y2[:, None] - xx
        d2 = dz * dz + dy * dy + dx * dx
        return jnp.minimum(best, jnp.min(d2, axis=0, keepdims=True))

    best = jnp.full((1, xz.shape[1]), 1e30, jnp.float32)
    best = jax.lax.fori_loop(0, m_total // m_tile, body, best)
    out_ref[0] = best


def nn_dist2_pallas(x: jnp.ndarray, y: jnp.ndarray, m_tile: int = 128) -> jnp.ndarray:
    """Pallas version: per-cloud kernel, y streamed in m_tile slices; the
    (m_tile, N) distance tile lives only in VMEM/registers."""
    B, N, _ = x.shape
    M = y.shape[1]
    N_pad = _round_up(N, 128)
    M_pad = _round_up(M, m_tile)
    xt = jnp.transpose(x, (0, 2, 1))  # (B, 3, N)
    yt = jnp.transpose(y, (0, 2, 1))
    if N_pad != N:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, N_pad - N)))
    if M_pad != M:
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, M_pad - M)),
                     constant_values=1e6)

    kernel = functools.partial(_nn_kernel, m_tile=m_tile, m_total=M_pad)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xt, yt)
    return out[:, 0, :N]


def nn_dist2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor squared distances (Pallas on TPU, XLA elsewhere)."""
    if jax.default_backend() == "tpu":
        return nn_dist2_pallas(x, y)
    return nn_dist2_xla(x, y)


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, sqrt: bool = False):
    """Symmetric Chamfer distance; returns (total, a->b term, b->a term)."""
    d_ab = nn_dist2(a, b)
    d_ba = nn_dist2(b, a)
    if sqrt:
        d_ab = jnp.sqrt(jnp.maximum(d_ab, 1e-12))
        d_ba = jnp.sqrt(jnp.maximum(d_ba, 1e-12))
    t1 = jnp.mean(d_ab, axis=-1)
    t2 = jnp.mean(d_ba, axis=-1)
    return t1 + t2, t1, t2
