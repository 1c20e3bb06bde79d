"""Mesh-estimation network: RGBA image -> (UV texture, UV displacement map).

Parity: reference ``ReconstructionNetwork`` + ``DatasetParams``
(``code/models/reconstruction.py``), NHWC / flax.linen.

Cross-replica batch norm comes for free: under jit with the batch axis
sharded over the mesh, ``jnp.mean`` over batch IS the global mean (XLA
inserts the collective) — the reference needed 740 LoC of sync_batchnorm
machinery for the same semantics (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from im23d_tpu.ops.sampling import adjust_poles, circpad, symmetrize_texture


def replicate_pad_w(x: jnp.ndarray, amount: int) -> jnp.ndarray:
    """Edge-replicate padding along width (NHWC) — emulates even-mirror
    boundary for symmetric meshes (reference ``reconstruction.py:35``)."""
    return jnp.pad(x, ((0, 0), (0, 0), (amount, amount), (0, 0)), mode="edge")


def circular_pad_w(x: jnp.ndarray, amount: int) -> jnp.ndarray:
    return circpad(x, amount)


def upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class ResBlock(nn.Module):
    """conv-bn-relu x2 + shortcut (reference ``reconstruction.py:7-25``).

    3x3 convs padded (1, 0) + width pad_fn (replicate or circular).
    ``dtype`` is the conv/BN compute dtype (params and BN statistics stay
    f32 — flax reduces statistics in f32 regardless).
    """

    ch_out: int
    pad_fn: Callable = replicate_pad_w
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ch_in = x.shape[-1]
        dt = self.dtype
        shortcut = x
        if ch_in != self.ch_out:
            shortcut = nn.Conv(self.ch_out, (1, 1), use_bias=False,
                               dtype=dt)(x)
        h = nn.Conv(
            ch_in, (3, 3), padding=((1, 1), (0, 0)), use_bias=False, dtype=dt
        )(self.pad_fn(x, 1))
        h = nn.BatchNorm(use_running_average=not train, dtype=dt)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.ch_out, (3, 3), padding=((1, 1), (0, 0)), use_bias=False,
            dtype=dt
        )(self.pad_fn(h, 1))
        h = nn.BatchNorm(use_running_average=not train, dtype=dt)(h)
        h = nn.relu(h)
        return h + shortcut


class ReconstructionNetwork(nn.Module):
    """RGBA 256x256 -> texture (tanh) + 32x32 mesh displacement map.

    Parity: ``reconstruction.py:28-137``; the mesh output conv is
    zero-initialized for stability, poles averaged, and both maps
    symmetrized when ``symmetric``.
    """

    symmetric: bool = True
    texture_res: int = 64
    mesh_res: int = 32
    # mixed precision: conv/dense compute dtype; params, BN statistics and
    # both outputs (texture, mesh map) stay float32 so the renderer /
    # losses / export paths are unchanged.  bfloat16 runs the conv stacks
    # on the MXU at 2x rate (the reference is pure-f32 CUDA).
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        assert self.texture_res in (64, 128, 256)
        pad = replicate_pad_w if self.symmetric else circular_pad_w
        dt = jnp.dtype(self.compute_dtype)

        def conv_bn(h, ch, k, s):
            # explicit symmetric k//2 padding: torch semantics; flax "SAME"
            # pads asymmetrically under stride 2 (breaks weight parity)
            pad_k = ((k // 2, k // 2), (k // 2, k // 2))
            h = nn.Conv(ch, (k, k), strides=(s, s), padding=pad_k,
                        use_bias=False, dtype=dt)(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=dt)(h)
            return nn.relu(h)

        h = conv_bn(x, 64, 5, 2)    # 256 -> 128
        h = conv_bn(h, 128, 3, 2)   # -> 64
        h = conv_bn(h, 256, 3, 2)   # -> 32
        h = conv_bn(h, 512, 3, 2)   # -> 16
        h = conv_bn(h, 64, 3, 2)    # -> 8
        h = h.reshape(h.shape[0], -1)
        z = nn.relu(
            nn.BatchNorm(use_running_average=not train, dtype=dt)(
                nn.Dense(256, use_bias=False, dtype=dt)(h)
            )
        )
        z = nn.relu(
            nn.BatchNorm(use_running_average=not train, dtype=dt)(
                nn.Dense(1024, use_bias=False, dtype=dt)(z)
            )
        )

        base_h, base_w = 4, (2 if self.symmetric else 4)
        bb = nn.Dense(base_h * base_w * 256, dtype=dt)(z).reshape(
            -1, base_h, base_w, 256
        )
        bb = upsample_nearest(ResBlock(512, pad, dt)(bb, train))   # 4 -> 8
        bb = upsample_nearest(ResBlock(256, pad, dt)(bb, train))   # 8 -> 16
        bb = upsample_nearest(ResBlock(256, pad, dt)(bb, train))   # 16 -> 32
        bb_mesh = bb
        if self.texture_res >= 128:
            bb = upsample_nearest(
                ResBlock(256, pad, dt, name="blk3b_tex")(bb, train)
            )
        if self.texture_res >= 256:
            bb = upsample_nearest(
                ResBlock(256, pad, dt, name="blk3c_tex")(bb, train)
            )

        mesh_map = ResBlock(64, pad, dt, name="blk4_mesh")(bb_mesh, train)
        # the mesh map is 32x32 — tiny; emit f32 for the geometry path
        mesh_map = nn.Conv(
            3, (5, 5), padding=((2, 2), (0, 0)),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_mesh", dtype=dt,
        )(pad(nn.relu(mesh_map), 2)).astype(jnp.float32)
        mesh_map = adjust_poles(mesh_map)

        tex = upsample_nearest(ResBlock(128, pad, dt, name="blk4_tex")(bb, train))
        tex = ResBlock(64, pad, dt, name="blk5_tex")(tex, train)
        # tanh in f32 (saturation precision); the texture is returned f32 —
        # at recon scale (<= 256^2) the cast is cheap and keeps the
        # renderer / loss / export contracts unchanged
        tex = jnp.tanh(
            nn.Conv(3, (5, 5), padding=((2, 2), (0, 0)), name="conv_tex",
                    dtype=dt)(pad(nn.relu(tex), 2)).astype(jnp.float32)
        )

        if self.symmetric:
            tex = symmetrize_texture(tex)
            mesh_map = symmetrize_texture(mesh_map)
        return tex, mesh_map


class DatasetParams(nn.Module):
    """Per-image learnable pose refinement (reference ``reconstruction.py:140-180``).

    Indices in [N, 2N) denote mirrored images: the x translation flips sign.
    ``mode='deltas'`` -> (translation (B, 3), scale (B, 1));
    ``mode='z0'`` -> 1 + exp(z0) perspective refinement.
    """

    dataset_size: int
    optimize_deltas: bool = True
    optimize_z0: bool = False

    @nn.compact
    def __call__(self, indices: jnp.ndarray | None, mode: str):
        assert mode in ("deltas", "z0")
        N = self.dataset_size
        if indices is not None:
            x_sign = (1.0 - 2.0 * (indices // N).astype(jnp.float32))[:, None]
            idx = indices % N
        else:
            x_sign = 1.0
            idx = None

        if mode == "deltas":
            assert self.optimize_deltas
            ds_translation = self.param(
                "ds_translation", nn.initializers.zeros, (N, 2)
            )
            ds_scale = self.param("ds_scale", nn.initializers.zeros, (N, 1))
            t = ds_translation[idx] if idx is not None else jnp.mean(
                ds_translation, axis=0, keepdims=True
            )
            s = ds_scale[idx] if idx is not None else jnp.mean(
                ds_scale, axis=0, keepdims=True
            )
            translation = jnp.concatenate(
                [t[:, :1] * x_sign, t[:, 1:2], jnp.zeros_like(t[:, :1])], axis=1
            )
            return translation, s
        assert self.optimize_z0
        ds_z0 = self.param("ds_z0", nn.initializers.ones, (N, 1))
        z0 = ds_z0[idx] if idx is not None else jnp.mean(ds_z0, axis=0, keepdims=True)
        return 1.0 + jnp.exp(z0)
