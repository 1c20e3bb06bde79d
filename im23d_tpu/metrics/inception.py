"""InceptionV3 feature extractor for FID (flax, NHWC).

Port of the torchvision ``inception_v3`` architecture as used by the
reference FID stack (``code/utils/inception.py``, pytorch-fid wrapper around
``torchvision.models.inception_v3(pretrained=True)``): blocks up to the
final average pooling (2048-d pool3 features), input bilinearly resized to
299 and scaled from (0,1) to (-1,1).

Weights: this environment has no torchvision / no model zoo access, so
``load_torch_state_dict`` converts a user-supplied torchvision state dict to
flax variables (module names mirror torch's so the mapping is mechanical).
Without weights the extractor runs with deterministic random init — FID
numbers are then self-consistent for regression tracking but not comparable
to published scores (documented limitation).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops.sampling import resize_bilinear


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _pad(k: int) -> tuple[tuple[int, int], tuple[int, int]]:
    return ((k, k), (k, k))


def max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def avg_pool_3x3_s1_pad1(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool_3x3_s1_pad1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Blocks 0-3 of the FID InceptionV3; returns 2048-d pool3 features.

    Input: (B, H, W, 3) in [0, 1].

    ``feature_layer="Mixed_5d"`` returns 288-d spatially-pooled mid-depth
    features instead: with RANDOM weights the pool3 head is useless (input
    differences contract to nothing by the Mixed_6 blocks — measured
    ~1e-8 feature batch-std), while Mixed_5d still discriminates; the
    uncalibrated-FID path uses this tap.  Pretrained-weight FID keeps
    pool3 (published-score comparable).
    """

    resize_input: bool = True
    normalize_input: bool = True
    feature_layer: str = "pool3"

    @nn.compact
    def __call__(self, x):
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = resize_bilinear(x, 299, 299, align_corners=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool_3x3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        if self.feature_layer == "Mixed_5d":
            return jnp.mean(x, axis=(1, 2))  # 288-d mid-depth features
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 2048


def init_inception(rng=None, calibrate: bool = True,
                   gain: float = 1.0, feature_layer: str = "Mixed_5d"):
    """(model, variables) with deterministic init; load real weights via
    ``load_torch_state_dict`` for published-score-comparable FID.

    ``calibrate`` standardizes every BatchNorm's running stats against the
    layer's actual pre-activation moments on seeded probe images (a few
    whole-net passes — earlier layers stabilize before later ones).  A raw
    random-init InceptionV3 collapses to near-constant pool3 features
    (~2e-6 batch std measured — 48 ReLU layers wash the signal out), which
    made ``fid_uncalibrated`` a zero-information metric; with calibrated
    per-layer standardization the random features discriminate inputs, so
    uncalibrated FID can track training (absolute values remain NOT
    comparable to published torchvision-weight scores).  Deterministic:
    pure function of ``rng``.
    """
    model = InceptionV3Features(feature_layer=feature_layer)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, jnp.zeros((1, 299, 299, 3)))
    if not calibrate:
        return model, variables

    # kernel gain: flax's lecun init is sub-critical for ReLU chains (input
    # differences contract ~sqrt(2)x per layer and die by the deep blocks);
    # scaling toward/past the He point keeps perturbations propagating while
    # the calibrated BN stats below keep magnitudes standardized
    scale = float(np.sqrt(gain))

    def _scale_kernels(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf * scale
            if path and getattr(path[-1], "key", None) == "kernel" else leaf,
            tree,
        )

    variables = {"params": _scale_kernels(variables["params"]),
                 "batch_stats": variables["batch_stats"]}

    probe = jax.random.uniform(
        jax.random.fold_in(rng, 1), (8, 299, 299, 3), jnp.float32
    )

    def _calibrate_pass(variables):
        _, state = model.apply(
            variables, probe, capture_intermediates=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]

        def walk(stats_node, inter_node):
            out = {}
            for key, val in stats_node.items():
                if key == "bn":  # sibling 'conv' output feeds this bn
                    conv_out = inter_node["conv"]["__call__"][0]
                    conv_out = conv_out.astype(jnp.float32)
                    m = jnp.mean(conv_out, axis=(0, 1, 2))
                    v = jnp.var(conv_out, axis=(0, 1, 2))
                    # early passes feed deep layers exploding activations
                    # (upstream standardization amplifies before downstream
                    # stats adapt): sanitize so the stable prefix can grow
                    # one stage per pass instead of poisoning the tree
                    m = jnp.where(jnp.isfinite(m), jnp.clip(m, -1e4, 1e4), 0.0)
                    v = jnp.where(jnp.isfinite(v), jnp.clip(v, 1e-4, 1e8), 1.0)
                    out[key] = {"mean": m, "var": v}
                else:
                    out[key] = walk(val, inter_node[key])
            return out

        return {
            "params": variables["params"],
            "batch_stats": walk(variables["batch_stats"], inter),
        }

    calibrate_jit = jax.jit(_calibrate_pass)
    for _ in range(20):  # ≥ the number of sequential conv stages
        variables = calibrate_jit(variables)
    return model, variables


def load_torch_state_dict(state_dict: dict) -> dict:
    """torchvision inception_v3 state dict -> flax variables for
    ``InceptionV3Features`` (conv OIHW -> HWIO; bn stats split out)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        v = np.asarray(value, dtype=np.float32)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], v)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], v)
            elif name == "running_mean":
                put(stats, parts[:-1] + ["mean"], v)
            elif name == "running_var":
                put(stats, parts[:-1] + ["var"], v)
        # fc / AuxLogits weights are unused by the feature extractor
    return {"params": params, "batch_stats": stats}
