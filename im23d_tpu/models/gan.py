"""Convolutional UV-space texture+mesh GAN (generator + multi-scale critics).

Parity: reference ``code/models/gan.py`` (Generator, ResBlockUp,
ConditionalBatchNorm2d, TextureDiscriminator, MeshDiscriminator,
MultiScaleDiscriminator, SpatialAttention, positional_encoding), NHWC flax.

Distributed-norm note: the reference's ``--norm_g syncbatch`` exists because
``nn.DataParallel`` computes batch-norm statistics per GPU; under SPMD jit
with the batch axis sharded, plain ``nn.BatchNorm`` already reduces over the
GLOBAL batch (XLA inserts the cross-chip collective), so ``syncbatch`` and
``batch`` are the same thing here (SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops.sampling import adjust_poles, circpad, symmetrize_texture
from im23d_tpu.models.reconstruction import (
    circular_pad_w,
    replicate_pad_w,
    upsample_nearest,
)


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Model-relevant subset of the reference argparse flags
    (``code/main.py:37-67``), same defaults."""

    texture_resolution: int = 512
    mesh_resolution: int = 32
    symmetric_g: bool = True
    texture_only: bool = False
    conditional_class: bool = False
    conditional_color: bool = False
    conditional_text: bool = False
    norm_g: str = "batch"  # syncbatch == batch under SPMD
    norm_d: str = "none"
    latent_dim: int = 64
    num_discriminators: int = 2
    mask_output: bool = True
    n_classes: Sequence[int] = (200,)
    text_embedding_dim: int = 256
    # mixed precision: conv/dense compute dtype.  Params, norm statistics
    # (flax reduces in f32 regardless) and the GAN losses stay float32; on
    # TPU "bfloat16" runs the conv stacks on the MXU at 2x rate.  The
    # reference has no AMP equivalent (pure f32 CUDA).
    compute_dtype: str = "float32"
    # TPU lane packing: bf16 tiles are (16, 128) — a 64-channel tensor wastes
    # half of every lane tile, and the round-3 roofline study measured the
    # 512^2 stage's memory-bound fusions at ~2.4x the HBM roofline for
    # exactly this reason (docs/runs/README.md).  wide_hires lifts the
    # generator's last (highest-resolution) block from 64 to 128 channels so
    # every full-res tensor occupies full lanes.  Architecture deviation
    # from the reference (more capacity at the top stage), so default off;
    # pretrained-weight import requires False.
    wide_hires: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def positional_encoding(ny: int, nx: int) -> np.ndarray:
    """Sine-cosine embedding wrapping around x (reference ``gan.py:9-20``),
    returned NHWC (ny, nx', 4)."""
    symmetric = nx == ny // 2
    nx = ny
    ty = np.linspace(0, np.pi, ny, endpoint=False)
    tx = np.linspace(-np.pi, np.pi, nx, endpoint=False)
    Y, X = np.meshgrid(tx, ty)
    result = np.stack([np.cos(X), np.sin(X), np.cos(Y), np.sin(Y)], axis=-1)
    if symmetric:
        q = result.shape[1] // 4
        return result[:, q:-q].astype(np.float32)
    return result.astype(np.float32)


def leaky_relu(x):
    return nn.leaky_relu(x, 0.2)


def avg_pool_box(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Box-pool a (B, H, W, C) map as two H/W box-matrix contractions.

    reduce_window forces a C-minor relayout of the full-res map (~5.7 ms
    for the 512^2 4-channel mesh-critic input, ~12 ms for a single-channel
    alpha on v5e); contracting the already-tiled H/W axes against a
    (H/k, H) box matrix instead runs on the MXU with no layout change.
    Exactly nn.avg_pool for divisible k.
    """
    B, H, W, C = x.shape
    eye_h = (
        jnp.repeat(jnp.eye(H // k, dtype=x.dtype), k, axis=1) / k
    )  # (H/k, H)
    eye_w = jnp.repeat(jnp.eye(W // k, dtype=x.dtype), k, axis=1) / k
    out = jnp.einsum(
        "ph,bhwc,qw->bpqc", eye_h, x, eye_w,
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def avg_pool_alpha(alpha: jnp.ndarray, k: int) -> jnp.ndarray:
    """Box-pool a (B, H, W, 1) alpha map (see ``avg_pool_box``)."""
    return avg_pool_box(alpha, k)


def _sn(layer: nn.Module) -> nn.Module:
    return nn.SpectralNorm(layer)


class ConditionalNorm(nn.Module):
    """Norm (no affine) + per-sample gamma/beta from the latent
    (reference ``ConditionalBatchNorm2d``, ``gan.py:264-286``)."""

    norm: str  # batch | syncbatch | instance | none
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        ch = x.shape[-1]
        if self.norm in ("batch", "syncbatch"):
            # flax reduces the batch statistics in f32 even when dtype is
            # half precision (force_float32_reductions)
            h = nn.BatchNorm(
                use_running_average=not train, use_bias=False, use_scale=False,
                dtype=self.dtype,
            )(x)
        elif self.norm == "instance":
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.var(xf, axis=(1, 2), keepdims=True)
            h = ((xf - mean) / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        elif self.norm == "none":
            h = x
        else:
            raise ValueError(self.norm)
        gamma = nn.Dense(ch, name="fc_gamma", dtype=self.dtype)(z)[:, None, None, :]
        beta = nn.Dense(ch, name="fc_beta", dtype=self.dtype)(z)[:, None, None, :]
        return h * (1.0 + gamma) + beta


class _HeadConvTanh(nn.Module):
    """conv_final + tanh with the same param tree as ``nn.Conv`` (kernel,
    bias) so checkpoints/weight import are unchanged; dispatches to the
    folded-width Pallas kernel on TPU and the plain XLA conv elsewhere."""

    features: int = 3
    dtype: Any = jnp.float32
    pad_mode: str = "replicate"

    @nn.compact
    def __call__(self, x):
        from im23d_tpu.ops.conv_pallas import head_conv_tanh, use_pallas_head

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (5, 5, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        x = x.astype(dt)
        if use_pallas_head() and x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0:
            y4 = head_conv_tanh(x, kernel.astype(dt), bias, True, self.pad_mode)
            return y4[..., : self.features]
        pad = replicate_pad_w if self.pad_mode == "replicate" else circular_pad_w
        y = jax.lax.conv_general_dilated(
            pad(x, 2), kernel.astype(dt), (1, 1), ((2, 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(dt)
        return jnp.tanh(y.astype(jnp.float32)).astype(dt)


class ResBlockUp(nn.Module):
    """Spectral-norm 3x3 conv block with conditional norm
    (reference ``gan.py:288-312``; no upsampling inside — callers upsample)."""

    ch_out: int
    norm: str
    pad_fn: Callable
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        ch_in = x.shape[-1]
        ch_mid = min(ch_in, self.ch_out)
        dt = self.dtype
        if ch_in != self.ch_out:
            shortcut = _sn(nn.Conv(self.ch_out, (1, 1), use_bias=False, dtype=dt))(
                x, update_stats=train
            )
        else:
            shortcut = x
        h = _sn(
            nn.Conv(ch_mid, (3, 3), padding=((1, 1), (0, 0)), use_bias=False,
                    dtype=dt)
        )(self.pad_fn(x, 1), update_stats=train)
        h = leaky_relu(ConditionalNorm(self.norm, dt, name="norm1")(h, z, train))
        h = _sn(
            nn.Conv(self.ch_out, (3, 3), padding=((1, 1), (0, 0)), use_bias=False,
                    dtype=dt)
        )(self.pad_fn(h, 1), update_stats=train)
        h = leaky_relu(ConditionalNorm(self.norm, dt, name="norm2")(h, z, train))
        return h + shortcut


class SpatialAttention(nn.Module):
    """AttnGAN-style word/region attention (reference ``gan.py:433-480``)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask=None):
        # x: (B, H, W, C); context: (B, L, Cd)
        B, H, W, C = x.shape
        ctx = nn.Conv(C, (1, 1), use_bias=False, name="conv_context",
                      dtype=self.dtype)(context[:, :, None, :])[:, :, 0, :]
        q = x.reshape(B, H * W, C)
        # logits/softmax in f32 for stability under bf16 compute
        attn = jnp.einsum("bqc,blc->bql", q, ctx,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            attn = attn - 1e4 * mask[:, None, :].astype(attn.dtype)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bql,blc->bqc", attn.astype(ctx.dtype), ctx)
        out = out.reshape(B, H, W, C)
        attn_map = attn.reshape(B, H, W, -1)
        return out, attn_map


class Generator(nn.Module):
    """z (+class embedding) -> (texture in [-1,1], mesh displacement map).

    Parity: reference ``Generator`` (``gan.py:314-426``): 8x8(x512) base
    (width halved when symmetric), ResBlockUp chain with upsampling pattern
    by texture resolution, zero-init mesh conv + adjust_poles, symmetrize.
    """

    cfg: GANConfig
    mesh_head: bool = True

    @nn.compact
    def __call__(self, z, c=None, caption=None, train: bool = True,
                 return_attention: bool = False):
        cfg = self.cfg
        dt = cfg.dtype
        emb_dim = cfg.latent_dim
        pad = replicate_pad_w if cfg.symmetric_g else circular_pad_w
        height, width = 8, (4 if cfg.symmetric_g else 8)

        if cfg.conditional_class:
            assert c is not None
            if cfg.conditional_color:
                e1 = nn.Embed(cfg.n_classes[0], emb_dim // 2, name="emb_class")(c[:, 0])
                e2 = nn.Embed(cfg.n_classes[1], emb_dim // 2, name="emb_color")(c[:, 1])
                z = jnp.concatenate([z, e1, e2], axis=1)
            else:
                e1 = nn.Embed(cfg.n_classes[0], emb_dim, name="emb_class")(c[:, 0])
                z = jnp.concatenate([z, e1], axis=1)

        z = z.astype(dt)
        x = nn.Dense(height * width * 512, name="fc", dtype=dt)(z)
        x = x.reshape(x.shape[0], height, width, 512)

        blk = lambda ch, name: ResBlockUp(ch, cfg.norm_g, pad, dt, name=name)
        x = upsample_nearest(blk(512, "blk1")(x, z, train))   # 8 -> 16
        x = blk(256, "blk2")(x, z, train)                     # 16

        attn_map = None
        if cfg.conditional_text and caption is not None:
            att_out, attn_map = SpatialAttention(dt, name="att")(
                x, caption[0].astype(dt), caption[1]
            )
            x = x + att_out

        x = upsample_nearest(x)                               # 16 -> 32

        x_tex = x
        if cfg.texture_resolution >= 256:
            x_tex = upsample_nearest(blk(256, "blk3a")(x_tex, z, train))
        if cfg.texture_resolution >= 512:
            x_tex = upsample_nearest(blk(256, "blk3b")(x_tex, z, train))
        if cfg.texture_resolution >= 1024:
            x_tex = upsample_nearest(blk(256, "blk3c")(x_tex, z, train))
        x_tex = upsample_nearest(blk(128, "blk4")(x_tex, z, train))
        x_tex = upsample_nearest(blk(128, "blk5")(x_tex, z, train))
        x_tex = leaky_relu(blk(128 if cfg.wide_hires else 64, "blk6")(
            x_tex, z, train))
        # tanh in f32 (saturation precision), texture stays in the compute
        # dtype: casting the 512^2 map to f32 here forces full-size f32
        # layout copies between G and D (profiled at ~12 ms/step at bs16) —
        # the trainer upcasts only where full precision is consumed (losses,
        # vertex sampling, export).  On TPU the conv+bias+tanh trio runs as
        # the folded-width Pallas kernel (ops/conv_pallas.py): XLA's C_out=3
        # emitters put 3 of 128 lanes to work (~18.7 ms of the bs-32 G step,
        # docs/runs/README.md roofline study).
        x_tex = _HeadConvTanh(
            dtype=dt,
            pad_mode="replicate" if cfg.symmetric_g else "circular",
            name="conv_final",
        )(x_tex)
        if dt != jnp.float32:
            # pin the f32->bf16 convert here: without the barrier XLA sinks
            # it past the downstream mask-multiply/concat, materializing the
            # 512^2 x 4 critic input in f32 (~25 ms/step of layout copies)
            x_tex = jax.lax.optimization_barrier(x_tex)

        x_mesh = None
        if self.mesh_head:
            x_mesh = leaky_relu(blk(64, "blk3_mesh")(x, z, train))
            # the mesh map is 32x32 — tiny; emit f32 for the geometry path
            x_mesh = nn.Conv(
                3, (5, 5), padding=((2, 2), (0, 0)),
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                name="conv_mesh", dtype=dt,
            )(pad(x_mesh, 2)).astype(jnp.float32)
            x_mesh = adjust_poles(x_mesh)

        if cfg.symmetric_g:
            x_tex = symmetrize_texture(x_tex)
            if x_mesh is not None:
                x_mesh = symmetrize_texture(x_mesh)
            if attn_map is not None:
                attn_map = symmetrize_texture(attn_map)

        if return_attention:
            return x_tex, x_mesh, attn_map
        return x_tex, x_mesh


def _norm_d_factory(cfg: GANConfig):
    """norm_d='instance' -> affine instance norm (GroupNorm with one channel
    per group, matching torch InstanceNorm2d(affine=True)); 'none' -> id."""
    if cfg.norm_d == "instance":
        return lambda name: (
            lambda h, train: nn.GroupNorm(group_size=1, name=name)(h)
        )
    if cfg.norm_d == "none":
        return lambda name: (lambda h, train: h)
    raise ValueError(cfg.norm_d)


class TextureDiscriminator(nn.Module):
    """Full-resolution UV texture critic (reference ``gan.py:123-233``)."""

    cfg: GANConfig
    downsample: int = 1

    @nn.compact
    def __call__(self, x, c=None, caption=None, train: bool = True,
                 alpha=None):
        cfg = self.cfg
        if self.downsample > 1:
            x = avg_pool_box(x, self.downsample)
        stride_first = (
            (self.downsample == 1 and cfg.texture_resolution >= 512)
            or cfg.texture_resolution >= 1024
            or cfg.conditional_text
        )
        mask = None
        if cfg.mask_output:
            ds_factor = 16 if stride_first else 8
            # pool in the input dtype, upcast after: pooling 512^2 alpha in
            # f32 forces a full-size f32 convert + layout copy (~12 ms/step).
            # When the caller passes the alpha channel it already holds, pool
            # it with the matmul box filter — slicing x[..., 3:4] out of the
            # tiled critic input (or reduce_window on the C=1 map) costs a
            # full-res layout copy (~12 ms/d-step).
            if alpha is None:
                pooled = avg_pool_box(x[..., 3:4], ds_factor)
            else:
                pooled = avg_pool_alpha(alpha, self.downsample * ds_factor)
            mask = jax.lax.stop_gradient(pooled.astype(jnp.float32))
        pe = jnp.asarray(positional_encoding(x.shape[1], x.shape[2]))[None]
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pe, (x.shape[0], *pe.shape[1:])).astype(x.dtype)],
            axis=-1,
        )

        dt = cfg.dtype
        bias = cfg.norm_d != "instance"
        norm = _norm_d_factory(cfg)

        if stride_first:
            h = _sn(nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                            dtype=dt))(circpad(x, 1), update_stats=train)
        else:
            h = _sn(nn.Conv(64, (5, 5), padding=((2, 2), (0, 0)), dtype=dt))(
                circpad(x, 2), update_stats=train
            )
        h = leaky_relu(h)
        h = _sn(nn.Conv(128, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                        use_bias=bias, dtype=dt))(circpad(h, 1), update_stats=train)
        h = leaky_relu(norm("bn2")(h, train))
        h = _sn(nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                        use_bias=bias, dtype=dt))(circpad(h, 1), update_stats=train)
        h = leaky_relu(norm("bn3")(h, train))
        h = _sn(nn.Conv(512, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                        use_bias=bias, dtype=dt))(circpad(h, 1), update_stats=train)
        h = leaky_relu(norm("bn4")(h, train))
        y = _sn(nn.Conv(1, (5, 5), padding=((2, 2), (0, 0)), dtype=dt))(
            circpad(h, 2), update_stats=train
        ).astype(jnp.float32)

        if cfg.conditional_class:
            emb = nn.Embed(cfg.n_classes[0], 512, name="projector")(c[:, 0])
            if cfg.conditional_color:
                emb = emb + nn.Embed(cfg.n_classes[1], 512, name="projector_col1")(c[:, 1])
            y = y + jnp.sum(h.astype(jnp.float32) * emb[:, None, None, :],
                            axis=-1, keepdims=True)
        elif cfg.conditional_text and caption is not None:
            att_out, _ = SpatialAttention(dt, name="att")(
                h, caption[0].astype(dt), caption[1]
            )
            y = y + jnp.sum((h * att_out).astype(jnp.float32),
                            axis=-1, keepdims=True)
        return y, mask


class MeshDiscriminator(nn.Module):
    """Mesh-resolution critic over (pooled texture, mesh map)
    (reference ``gan.py:23-121``)."""

    cfg: GANConfig

    @nn.compact
    def __call__(self, texture, mesh_map, c=None, caption=None,
                 train: bool = True, alpha=None):
        cfg = self.cfg
        pool_to_mesh = texture.shape[1] // mesh_map.shape[1]
        x = avg_pool_box(texture, pool_to_mesh)
        x = jnp.concatenate([x, mesh_map.astype(x.dtype)], axis=-1)
        mask = None
        if cfg.mask_output:
            # mesh-D input is already pooled to 32^2; keep the same
            # pool-then-upcast order as the texture D (and the same
            # slice-free matmul alpha path — avg pools compose)
            if alpha is None:
                pooled = avg_pool_box(x[..., 3:4], 4)
            else:
                pooled = avg_pool_alpha(alpha, pool_to_mesh * 4)
            mask = jax.lax.stop_gradient(pooled.astype(jnp.float32))
        pe = jnp.asarray(positional_encoding(x.shape[1], x.shape[2]))[None]
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pe, (x.shape[0], *pe.shape[1:])).astype(x.dtype)],
            axis=-1,
        )

        dt = cfg.dtype
        bias = cfg.norm_d != "instance"
        norm = _norm_d_factory(cfg)

        h = leaky_relu(
            _sn(nn.Conv(64, (5, 5), padding=((2, 2), (0, 0)), dtype=dt))(
                circpad(x, 2), update_stats=train
            )
        )
        h = _sn(nn.Conv(128, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                        use_bias=bias, dtype=dt))(circpad(h, 1), update_stats=train)
        h = leaky_relu(norm("bn2")(h, train))
        h = _sn(nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (0, 0)),
                        use_bias=bias, dtype=dt))(circpad(h, 1), update_stats=train)
        h = leaky_relu(norm("bn3")(h, train))
        y = _sn(nn.Conv(1, (5, 5), padding=((2, 2), (0, 0)), dtype=dt))(
            circpad(h, 2), update_stats=train
        ).astype(jnp.float32)

        if cfg.conditional_class:
            emb = nn.Embed(cfg.n_classes[0], 256, name="projector")(c[:, 0])
            if cfg.conditional_color:
                emb = emb + nn.Embed(cfg.n_classes[1], 256, name="projector_col1")(c[:, 1])
            y = y + jnp.sum(h.astype(jnp.float32) * emb[:, None, None, :],
                            axis=-1, keepdims=True)
        elif cfg.conditional_text and caption is not None:
            att_out, _ = SpatialAttention(dt, name="att")(
                h, caption[0].astype(dt), caption[1]
            )
            y = y + jnp.sum((h * att_out).astype(jnp.float32),
                            axis=-1, keepdims=True)
        return y, mask


class MultiScaleDiscriminator(nn.Module):
    """d1 = full texture, d2 = mesh (or tex/2 when texture_only),
    optional d3 = tex/4 (reference ``gan.py:235-260``)."""

    cfg: GANConfig

    @nn.compact
    def __call__(self, x, mesh_map=None, c=None, caption=None,
                 train: bool = True, alpha=None):
        cfg = self.cfg
        outs, masks = [], []
        y1, m1 = TextureDiscriminator(cfg, 1, name="d1")(
            x, c, caption, train, alpha=alpha
        )
        outs.append(y1)
        masks.append(m1)
        if not cfg.texture_only:
            y2, m2 = MeshDiscriminator(cfg, name="d2")(
                x, mesh_map, c, caption, train, alpha=alpha
            )
        else:
            y2, m2 = TextureDiscriminator(cfg, 2, name="d2")(
                x, c, caption, train, alpha=alpha
            )
        outs.append(y2)
        masks.append(m2)
        if cfg.num_discriminators == 3:
            y3, m3 = TextureDiscriminator(cfg, 4, name="d3")(
                x, c, caption, train, alpha=alpha
            )
            outs.append(y3)
            masks.append(m3)
        elif cfg.num_discriminators != 2:
            raise ValueError(cfg.num_discriminators)
        return outs, masks
