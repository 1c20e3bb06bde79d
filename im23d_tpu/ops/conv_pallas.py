"""Folded-width Pallas conv kernels for the 512² GAN texture head.

Why this exists: the round-3 roofline study (docs/runs/README.md) measured
the generator's texture-head conv family (5×5, C_out=3, 512²) at ~18.7 ms
of the bs-32 G step — ~25× the HBM roofline — because XLA's emitters put 3
output channels in 3 of 128 lanes (``EmitOutputBatchInLanesInputBatch
InSublanes``).  Every XLA-reachable rewrite (C_out zero-padding, width
folding at the graph level) was measured and rejected there; this module is
the named-but-unbuilt custom-kernel attack (VERDICT r4 item 2).

Design — "folded width" matmuls: pack output columns into lanes so the MXU
sees full tiles.  For an output tile of ``Wb`` columns the kernel computes

    y[r, wo*4 + co] = Σ_{dh}  x[r + dh, (wi·Wb..)·Cin + :] @ W2[dh]

where ``W2[dh]`` is the (Win·Cin, Wb·4) folded weight matrix (zeros where
|wi - wo| ≥ KW) built once per call from the (5, 5, Cin, 3) parameter, and
channel slot 3 is a zero pad so ``Wb·4`` hits the 128-lane boundary.  The
input rides flattened as (B, H+4, (W+4)·Cin) so every slice the kernel
takes is 128-lane aligned; row strips overlap by KH-1 rows, which BlockSpec
tiling cannot express, so the input stays in HBM (``pltpu.ANY``) and each
grid step DMAs its strip into a VMEM scratch.  Bias-add + tanh fuse into
the kernel epilogue in f32 (the model's separate f32 cast pass disappears).

Backward: dW is a second Pallas kernel (sublane-contraction dots per tap
row, accumulated across the grid into a folded (KH, Win·Cin, Wb·4) buffer,
un-folded by a tiny einsum outside); dx is left to XLA's transpose conv —
C_in=3 makes it cheap relative to the forward — applied to the tanh-chained
cotangent.  Reference op: ``code/models/gan.py`` Generator ``conv_final``
(5×5 conv → tanh); parity test: ``tests/test_conv_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# folded-weight construction (traced, tiny)
# ---------------------------------------------------------------------------


def _fold_matrix(KW: int, Wb: int) -> np.ndarray:
    """S[dw, vi, wo] = 1 iff input column vi feeds output column wo at tap
    dw (vi = wo + dw)."""
    Win = Wb + KW - 1
    S = np.zeros((KW, Win, Wb), np.float32)
    for dw in range(KW):
        for wo in range(Wb):
            S[dw, wo + dw, wo] = 1.0
    return S


def _fold_fwd_weights(kernel: jnp.ndarray, Wb: int, co_pad: int) -> jnp.ndarray:
    """(KH, KW, Cin, Cout) -> (KH, (Wb+KW-1)*Cin, Wb*co_pad) folded mats."""
    KH, KW, Cin, Cout = kernel.shape
    S = jnp.asarray(_fold_matrix(KW, Wb), kernel.dtype)
    W2 = jnp.einsum("dvw,kdco->kvcwo", S, kernel)  # (KH, Win, Cin, Wb, Cout)
    W2 = jnp.pad(W2, ((0, 0),) * 3 + ((0, 0), (0, co_pad - Cout)))
    Win = Wb + KW - 1
    return W2.reshape(KH, Win * Cin, Wb * co_pad)


def _unfold_dw(dw_raw: jnp.ndarray, KH: int, KW: int, Cin: int, Cout: int,
               Wb: int, co_pad: int) -> jnp.ndarray:
    """Inverse of the folding for the weight cotangent: (KH, Win*Cin,
    Wb*co_pad) accumulated raw products -> (KH, KW, Cin, Cout)."""
    Win = Wb + KW - 1
    S = jnp.asarray(_fold_matrix(KW, Wb), dw_raw.dtype)
    r = dw_raw.reshape(KH, Win, Cin, Wb, co_pad)[..., :Cout]
    return jnp.einsum("kvcwo,dvw->kdco", r, S)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_hbm, w2_ref, bias_ref, out_ref, xbuf, sem, *, R, W, Wb,
                KH, KW, Cin, co_pad, tanh_out):
    b = pl.program_id(0)
    s = pl.program_id(1)
    Win = Wb + KW - 1
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(s * R, _dma_rows(R, KH)), :], xbuf, sem
    )
    dma.start()
    dma.wait()
    for wi in range(W // Wb):
        acc = jnp.zeros((R, Wb * co_pad), jnp.float32)
        for dh in range(KH):
            a = xbuf[pl.ds(dh, R), pl.ds(wi * Wb * Cin, Win * Cin)]
            acc = acc + jax.lax.dot_general(
                a, w2_ref[dh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = acc + bias_ref[0][None, :]
        if tanh_out:
            y = jnp.tanh(y)
        out_ref[0, :, pl.ds(wi * Wb * co_pad, Wb * co_pad)] = y.astype(
            out_ref.dtype
        )


def _dma_rows(R: int, KH: int) -> int:
    """Rows per strip DMA: R + KH - 1 rounded up to the 8-row sublane tile
    (Mosaic requires HBM slice shapes aligned to the tiling; the slack rows
    land in scratch but are never read)."""
    return -(-(R + KH - 1) // 8) * 8


def _pad_input(x: jnp.ndarray, KH: int, KW: int,
               pad_mode: str = "replicate",
               h_total: int | None = None) -> jnp.ndarray:
    """W-pad by (KW-1)/2 each side (edge-replicate or circular, matching
    ``models/reconstruction.py`` {replicate,circular}_pad_w), zero-pad H
    likewise, flatten the (W, C) minor dims (the model applies exactly this
    pad pair around conv_final: ``models/gan.py`` pad(x, 2) + Conv padding
    ((2, 2), (0, 0)))."""
    B, H, W, C = x.shape
    pw, ph = (KW - 1) // 2, (KH - 1) // 2
    if pad_mode == "replicate":
        left = jnp.repeat(x[:, :, :1], pw, axis=2)
        right = jnp.repeat(x[:, :, -1:], pw, axis=2)
    else:  # circular
        left, right = x[:, :, -pw:], x[:, :, :pw]
    xp = jnp.concatenate([left, x, right], axis=2)
    bottom = ph
    if h_total is not None:  # DMA-alignment slack rows (never read)
        bottom += h_total - (H + KH - 1)
    xp = jnp.pad(xp, ((0, 0), (ph, bottom), (0, 0), (0, 0)))
    return xp.reshape(B, xp.shape[1], (W + KW - 1) * C)


def _fwd_call(xp2: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
              H: int, W: int, co_pad: int, R: int, Wb: int,
              tanh_out: bool, out_dtype) -> jnp.ndarray:
    B = xp2.shape[0]
    KH, KW, Cin, Cout = kernel.shape
    Win = Wb + KW - 1
    w2 = _fold_fwd_weights(kernel, Wb, co_pad)
    bias_l = jnp.pad(bias.astype(jnp.float32), (0, co_pad - Cout))
    bias_l = jnp.tile(bias_l, Wb)[None, :]  # (1, Wb*co_pad)

    kern = functools.partial(
        _fwd_kernel, R=R, W=W, Wb=Wb, KH=KH, KW=KW, Cin=Cin, co_pad=co_pad,
        tanh_out=tanh_out,
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((KH, Win * Cin, Wb * co_pad), lambda b, s: (0, 0, 0)),
            pl.BlockSpec((1, Wb * co_pad), lambda b, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, W * co_pad), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * co_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_dma_rows(R, KH), (W + KW - 1) * Cin), xp2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(xp2, w2, bias_l)


# ---------------------------------------------------------------------------
# dW kernel: folded raw products accumulated across the grid
# ---------------------------------------------------------------------------


def _dw_kernel(x_hbm, dy_hbm, out_ref, xbuf, dybuf, sems, *, R, W, Wb, KH,
               KW, Cin, co_pad):
    b = pl.program_id(0)
    s = pl.program_id(1)
    Win = Wb + KW - 1
    dma_x = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(s * R, _dma_rows(R, KH)), :], xbuf, sems.at[0]
    )
    dma_y = pltpu.make_async_copy(
        dy_hbm.at[b, pl.ds(s * R, R), :], dybuf, sems.at[1]
    )
    dma_x.start()
    dma_y.start()

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    dma_x.wait()
    dma_y.wait()
    for dh in range(KH):
        for wi in range(W // Wb):
            xs = xbuf[pl.ds(dh, R), pl.ds(wi * Wb * Cin, Win * Cin)]
            ys = dybuf[:, pl.ds(wi * Wb * co_pad, Wb * co_pad)]
            prod = jax.lax.dot_general(
                xs, ys,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Win*Cin, Wb*co_pad)
            out_ref[dh] = out_ref[dh] + prod


def _dw_call(xp2: jnp.ndarray, dy2: jnp.ndarray, H: int, W: int, KH: int,
             KW: int, Cin: int, co_pad: int, R: int, Wb: int) -> jnp.ndarray:
    B = xp2.shape[0]
    Win = Wb + KW - 1
    kern = functools.partial(
        _dw_kernel, R=R, W=W, Wb=Wb, KH=KH, KW=KW, Cin=Cin, co_pad=co_pad,
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KH, Win * Cin, Wb * co_pad), lambda b, s: (0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((KH, Win * Cin, Wb * co_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_dma_rows(R, KH), (W + KW - 1) * Cin), xp2.dtype),
            pltpu.VMEM((R, W * co_pad), dy2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(xp2, dy2)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

_CO_PAD = 4

# tests force the Pallas path off-TPU (interpret mode), mirroring
# losses/effective.py's _FORCE_PALLAS_PROJECTION convention
_FORCE_PALLAS_HEAD = False


def use_pallas_head() -> bool:
    """Default OFF (round-5 measured rejection): the kernel beats XLA's
    conv core (~28 vs ~42 ms at bs32 incl. tunnel constant) but the
    integration costs — input pad materialization + output unfold/slice —
    give ~304 (XLA) vs ~313 ms (Pallas) same-session 1G+2D groups, the same
    failure mode as the round-3 XLA-level width fold (docs/runs/README.md).
    IM23D_PALLAS_HEAD=1 opts in for experiments."""
    import os

    if os.environ.get("IM23D_PALLAS_HEAD"):
        return True
    return _FORCE_PALLAS_HEAD


def _pick_blocks(H: int, W: int) -> tuple[int, int]:
    """Row-strip height and output-column tile width: 128/32 at production
    512² (all slices 128-lane aligned for Cin=64), divisors at test shapes."""
    R = 128 if H % 128 == 0 else H
    Wb = 32 if W % 32 == 0 else (16 if W % 16 == 0 else W)
    return R, Wb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_conv_tanh(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   tanh_out: bool = True,
                   pad_mode: str = "replicate") -> jnp.ndarray:
    """5×5 conv ({replicate|circular}-W / zero-H pad) + bias + tanh at
    C_out=3, emitted channel-padded to 4: (B, H, W, Cin) -> (B, H, W, 4) in
    the input dtype (channel 3 is tanh(0)=0 when tanh_out else 0+0).

    Drop-in for the generator's ``conv_final`` + tanh pair
    (``models/gan.py``); callers slice ``[..., :3]``.
    """
    y, _ = _head_fwd(x, kernel, bias, tanh_out, pad_mode)
    return y


def _head_fwd(x, kernel, bias, tanh_out, pad_mode):
    B, H, W, Cin = x.shape
    R, Wb = _pick_blocks(H, W)
    KH = kernel.shape[0]
    xp2 = _pad_input(x, KH, kernel.shape[1], pad_mode,
                     h_total=(H // R - 1) * R + _dma_rows(R, KH))
    y2 = _fwd_call(xp2, kernel.astype(x.dtype), bias, H, W, _CO_PAD,
                   R, Wb, tanh_out, x.dtype)
    y = y2.reshape(B, H, W, _CO_PAD)
    return y, (xp2, kernel, y)


def _head_bwd(tanh_out, pad_mode, residuals, dy):
    xp2, kernel, y = residuals
    KH, KW, Cin, Cout = kernel.shape
    B, H, W, _ = y.shape
    R, Wb = _pick_blocks(H, W)
    dyf = dy.astype(jnp.float32)
    if tanh_out:
        dyf = dyf * (1.0 - y.astype(jnp.float32) ** 2)
    db = jnp.sum(dyf[..., :Cout], axis=(0, 1, 2)).astype(kernel.dtype)

    # dW via the folded Pallas kernel
    dy2 = dyf.astype(xp2.dtype).reshape(B, H, W * _CO_PAD)
    dw_raw = _dw_call(xp2, dy2, H, W, KH, KW, Cin, _CO_PAD, R, Wb)
    dkernel = _unfold_dw(dw_raw, KH, KW, Cin, Cout, Wb,
                         _CO_PAD).astype(kernel.dtype)

    # dx via XLA transpose conv on the (cheap) C_out=3 cotangent, then the
    # replicate-pad fold-back on the W edges
    dy3 = dyf[..., :Cout].astype(xp2.dtype)
    flip = kernel[::-1, ::-1].astype(xp2.dtype)  # (KH, KW, Cin, Cout)
    dxp = jax.lax.conv_general_dilated(
        dy3, jnp.swapaxes(flip, 2, 3),  # contract over Cout
        window_strides=(1, 1),
        padding=((KH - 1, KH - 1), (KW - 1, KW - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H + KH - 1, W + KW - 1, Cin) grads w.r.t. the padded input
    ph, pw = (KH - 1) // 2, (KW - 1) // 2
    dxp = dxp[:, ph:ph + H]  # zero-pad H rows carry no gradient
    dx = dxp[:, :, pw:pw + W]
    if pad_mode == "replicate":
        dx = dx.at[:, :, 0].add(jnp.sum(dxp[:, :, :pw], axis=2))
        dx = dx.at[:, :, -1].add(jnp.sum(dxp[:, :, pw + W:], axis=2))
    else:  # circular: left pad came from the right edge and vice versa
        dx = dx.at[:, :, W - pw:].add(dxp[:, :, :pw])
        dx = dx.at[:, :, :pw].add(dxp[:, :, pw + W:])
    return dx.astype(xp2.dtype), dkernel, db


head_conv_tanh.defvjp(_head_fwd, _head_bwd)


# ---------------------------------------------------------------------------
# Fused affine+lrelu+conv3x3 for the 64/128-channel 512² ResBlockUp stage.
#
# y = conv3x3(act),  act = leaky_relu(x*A + Bb)  with per-(batch, channel)
# A/Bb (the BatchNorm/conditional-affine chain folded to one multiply-add:
# A = inv_std*(1+gamma), Bb = beta - mean*A).  The elementwise chain rides
# INSIDE the conv kernel in both directions, so the memory-bound norm/lrelu
# backward fusions the round-3 roofline study measured at ~26 ms of the
# bs-32 G step (conditional-norm bwd 14.1 + leaky-relu bwd selects 12.5)
# never materialize.  Folding/tiling identical to the head kernel above
# with co_pad == Cout (64 keeps full 128-lane tiles at Wb=2k).
# ---------------------------------------------------------------------------

_LRELU_SLOPE = 0.2


def _affine_act(xs, a_row, b_row, row_mask):
    """lrelu(xs*a + b) masked to zero on H-pad rows; f32 in, dtype out."""
    pre = xs.astype(jnp.float32) * a_row + b_row
    act = jnp.where(pre >= 0, pre, _LRELU_SLOPE * pre)
    return jnp.where(row_mask, act, 0.0)


def _fused_fwd_kernel(x_hbm, at_hbm, bt_hbm, w2_ref, out_ref, xbuf, abuf,
                      bbuf, sems, *, R, H, W, Wb, KH, KW, Cin, Cout,
                      affine):
    b = pl.program_id(0)
    s = pl.program_id(1)
    Win = Wb + KW - 1
    dma_x = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(s * R, _dma_rows(R, KH)), :], xbuf, sems.at[0]
    )
    dma_x.start()
    if affine:
        dma_a = pltpu.make_async_copy(at_hbm.at[b], abuf, sems.at[1])
        dma_b = pltpu.make_async_copy(bt_hbm.at[b], bbuf, sems.at[2])
        dma_a.start()
        dma_b.start()
        dma_a.wait()
        dma_b.wait()
    dma_x.wait()

    ph = (KH - 1) // 2
    # global padded-row index of xbuf row r is s*R + r; pad rows (0, H+1)
    # must stay zero through the affine
    rows = jax.lax.broadcasted_iota(jnp.int32, (_dma_rows(R, KH), 1), 0) + s * R
    row_mask = jnp.logical_and(rows > ph - 1, rows < H + ph)

    for wi in range(W // Wb):
        acc = jnp.zeros((R, Wb * Cout), jnp.float32)
        for dh in range(KH):
            xs = xbuf[pl.ds(dh, R), pl.ds(wi * Wb * Cin, Win * Cin)]
            if affine:
                sl = pl.ds(wi * Wb * Cin, Win * Cin)
                a_row = abuf[0, sl][None, :]
                b_row = bbuf[0, sl][None, :]
                act = _affine_act(
                    xs, a_row, b_row, row_mask[dh:dh + R]
                ).astype(xbuf.dtype)
            else:
                act = xs
            acc = acc + jax.lax.dot_general(
                act, w2_ref[dh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, pl.ds(wi * Wb * Cout, Wb * Cout)] = acc.astype(
            out_ref.dtype
        )


def _fused_conv_fwd_call(xp2, at, bt, kernel, H, W, R, Wb, out_dtype):
    B = xp2.shape[0]
    KH, KW, Cin, Cout = kernel.shape
    Win = Wb + KW - 1
    w2 = _fold_fwd_weights(kernel, Wb, Cout)
    affine = at is not None
    if not affine:  # dummies keep the pallas signature static
        at = jnp.zeros((B, 1, (W + KW - 1) * Cin), jnp.float32)
        bt = at
    kern = functools.partial(
        _fused_fwd_kernel, R=R, H=H, W=W, Wb=Wb, KH=KH, KW=KW, Cin=Cin,
        Cout=Cout, affine=affine,
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((KH, Win * Cin, Wb * Cout), lambda b, s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, W * Cout), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_dma_rows(R, KH), (W + KW - 1) * Cin), xp2.dtype),
            pltpu.VMEM((1, (W + KW - 1) * Cin), jnp.float32),
            pltpu.VMEM((1, (W + KW - 1) * Cin), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(xp2, at, bt, w2)


def _tile_affine(v: jnp.ndarray, W: int, KW: int) -> jnp.ndarray:
    """(B, Cin) -> (B, 1, (W+KW-1)*Cin) lane-tiled f32 (kernel row vector)."""
    B, Cin = v.shape
    return jnp.tile(v.astype(jnp.float32), (1, W + KW - 1))[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_affine_conv3x3(x, a, bb, kernel, _unused, pad_mode="replicate"):
    """conv3x3(leaky_relu(x*a + bb)) with {replicate|circular}-W / zero-H
    padding; a, bb are per-(batch, channel) affine rows or None (plain
    conv).  (B, H, W, Cin) -> (B, H, W, Cout) in the input dtype."""
    y, _ = _fused_fwd(x, a, bb, kernel, _unused, pad_mode)
    return y


def _fused_fwd(x, a, bb, kernel, _unused, pad_mode):
    B, H, W, Cin = x.shape
    KH, KW, Cin_k, Cout = kernel.shape
    assert Cin_k == Cin
    import os

    R = int(os.environ.get("IM23D_CONV_R", "128"))
    if H % R:
        R = H
    Wb = int(os.environ.get("IM23D_CONV_WB", "4"))
    if W % Wb or Cout % 32:
        Wb = W
    xp2 = _pad_input(x, KH, KW, pad_mode,
                     h_total=(H // R - 1) * R + _dma_rows(R, KH))
    at = _tile_affine(a, W, KW) if a is not None else None
    bt = _tile_affine(bb, W, KW) if bb is not None else None
    y2 = _fused_conv_fwd_call(xp2, at, bt, kernel.astype(x.dtype), H, W, R,
                              Wb, x.dtype)
    y = y2.reshape(B, H, W, Cout)
    return y, (x, a, bb, kernel)


def _fused_bwd(pad_mode, residuals, dy):
    """Reference backward in XLA (correct, unfused): recompute act, use
    conv transposes.  The Pallas backward kernels land separately; this
    keeps the op differentiable end-to-end meanwhile."""
    x, a, bb, kernel = residuals
    KH, KW, Cin, Cout = kernel.shape
    B, H, W, _ = x.shape
    ph, pw = (KH - 1) // 2, (KW - 1) // 2

    xf = x.astype(jnp.float32)
    if a is not None:
        pre = xf * a[:, None, None, :] + bb[:, None, None, :]
        act = jnp.where(pre >= 0, pre, _LRELU_SLOPE * pre)
    else:
        act = xf
    # pad act exactly as the kernel does
    if pad_mode == "replicate":
        left = jnp.repeat(act[:, :, :1], pw, axis=2)
        right = jnp.repeat(act[:, :, -1:], pw, axis=2)
    else:
        left, right = act[:, :, -pw:], act[:, :, :pw]
    actp = jnp.concatenate([left, act, right], axis=2)
    actp = jnp.pad(actp, ((0, 0), (ph, ph), (0, 0), (0, 0)))

    dyf = dy.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    # dW: correlate padded activations with dy
    dkernel = jax.lax.conv_general_dilated(
        jnp.transpose(actp, (3, 1, 2, 0)),       # (Cin, Hp, Wp, B)
        jnp.transpose(dyf, (1, 2, 0, 3)),        # (H, W, B, Cout)
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (Cin, KH, KW, Cout)
    dkernel = jnp.transpose(dkernel, (1, 2, 0, 3)).astype(kernel.dtype)

    # dact via transpose conv
    flip = kf[::-1, ::-1]
    dactp = jax.lax.conv_general_dilated(
        dyf, jnp.swapaxes(flip, 2, 3), (1, 1),
        ((KH - 1, KH - 1), (KW - 1, KW - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+KH-1, W+KW-1, Cin): grads w.r.t. actp
    dact = dactp[:, ph:ph + H]
    dact_mid = dact[:, :, pw:pw + W]
    if pad_mode == "replicate":
        dact_mid = dact_mid.at[:, :, 0].add(
            jnp.sum(dact[:, :, :pw], axis=2)
        ).at[:, :, -1].add(jnp.sum(dact[:, :, pw + W:], axis=2))
    else:
        dact_mid = dact_mid.at[:, :, W - pw:].add(dact[:, :, :pw])
        dact_mid = dact_mid.at[:, :, :pw].add(dact[:, :, pw + W:])

    if a is not None:
        dpre = dact_mid * jnp.where(pre >= 0, 1.0, _LRELU_SLOPE)
        dx = (dpre * a[:, None, None, :]).astype(x.dtype)
        da = jnp.sum(dpre * xf, axis=(1, 2)).astype(a.dtype)
        dbb = jnp.sum(dpre, axis=(1, 2)).astype(bb.dtype)
    else:
        dx = dact_mid.astype(x.dtype)
        da = None
        dbb = None
    return dx, da, dbb, dkernel, None


fused_affine_conv3x3.defvjp(_fused_fwd, _fused_bwd)
