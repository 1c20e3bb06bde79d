"""Torch-checkpoint -> flax-variable converters for pretrained weights.

BASELINE's north star includes "mesh/texture outputs matching the PyTorch
reference on pretrained CUB and P3D weights".  These converters map the
reference's state-dict names (module structure documented in SURVEY.md §2.1
#5/#6) onto this framework's flax trees:

* ``convert_reconstruction``: reference ``ReconstructionNetwork``
  (``code/models/reconstruction.py:28-137``) -> ``models.reconstruction``.
* ``convert_generator``: reference ``Generator`` (``code/models/gan.py:314-426``)
  -> ``models.gan.Generator``.

Conventions: torch convs are OIHW -> flax HWIO; Linear weights transpose;
BatchNorm running stats move to the ``batch_stats`` collection; spectral-norm
wrapped convs store ``weight_orig`` (the unnormalized kernel) plus power-
iteration vectors ``u/v`` (mapped into flax SpectralNorm's state).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def _dense(w):  # (out, in) -> (in, out)
    return np.asarray(w, np.float32).T


def _dense_from_chw(w, c: int, h: int, wd: int):
    """Linear consuming a flattened feature map: torch flattens (C, H, W),
    flax NHWC flattens (H, W, C) — permute the kernel's input rows."""
    w = np.asarray(w, np.float32)  # (out, C*H*W)
    w = w.reshape(w.shape[0], c, h, wd).transpose(0, 2, 3, 1)
    return w.reshape(w.shape[0], -1).T  # (H*W*C, out)


def _dense_to_chw(w, c: int, h: int, wd: int):
    """Linear whose output is reshaped to a feature map: torch views the
    output as (C, H, W), flax NHWC views it as (H, W, C) — permute the
    kernel's output columns (and the bias) accordingly."""
    w = np.asarray(w, np.float32)  # (out=C*H*W, in)
    w = w.reshape(c, h, wd, w.shape[1]).transpose(1, 2, 0, 3)
    return w.reshape(-1, w.shape[3]).T  # (in, H*W*C)


def _vec_to_chw(b, c: int, h: int, wd: int):
    b = np.asarray(b, np.float32).reshape(c, h, wd)
    return b.transpose(1, 2, 0).reshape(-1)


def _put(tree: dict, path: list[str], leaf) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _bn(sd: Mapping, prefix: str, params: dict, stats: dict, path: list[str],
        affine: bool = True) -> None:
    if affine and f"{prefix}.weight" in sd:
        _put(params, path + ["scale"], np.asarray(sd[f"{prefix}.weight"], np.float32))
        _put(params, path + ["bias"], np.asarray(sd[f"{prefix}.bias"], np.float32))
    _put(stats, path + ["mean"], np.asarray(sd[f"{prefix}.running_mean"], np.float32))
    _put(stats, path + ["var"], np.asarray(sd[f"{prefix}.running_var"], np.float32))


def convert_reconstruction(sd: Mapping) -> dict:
    """Reference ReconstructionNetwork state dict -> flax variables.

    Torch name -> flax name mapping (reference ``reconstruction.py:51-96``):
    conv{1..5}e/bn{1..5}e -> Conv_0..4 / BatchNorm_0..4; fc1e/bnfc1e,
    fc3e/bnfc3e -> Dense_0/BatchNorm_5, Dense_1/BatchNorm_6; fc1_tex ->
    Dense_2; blk{1,2,3} -> ResBlock_0..2; blk3b/3c_tex, blk4_mesh, conv_mesh,
    blk4_tex, blk5_tex, conv_tex keep their names.
    """
    params: dict = {}
    stats: dict = {}

    for i in range(5):
        _put(params, [f"Conv_{i}", "kernel"], _conv(sd[f"conv{i+1}e.weight"]))
        _bn(sd, f"bn{i+1}e", params, stats, [f"BatchNorm_{i}"])
    # fc1e consumes the flattened (B, 64, 8, 8) encoder map: permute its
    # input rows from torch's CHW-flatten to the NHWC HWC-flatten
    _put(params, ["Dense_0", "kernel"], _dense_from_chw(sd["fc1e.weight"], 64, 8, 8))
    _bn(sd, "bnfc1e", params, stats, ["BatchNorm_5"])
    _put(params, ["Dense_1", "kernel"], _dense(sd["fc3e.weight"]))
    _bn(sd, "bnfc3e", params, stats, ["BatchNorm_6"])
    # fc1_tex's output is viewed as a (256, 4, base_w) CHW map
    # (``reconstruction.py:117``); flax reshapes (4, base_w, 256)
    base_w = np.asarray(sd["fc1_tex.weight"]).shape[0] // (256 * 4)
    _put(params, ["Dense_2", "kernel"],
         _dense_to_chw(sd["fc1_tex.weight"], 256, 4, base_w))
    _put(params, ["Dense_2", "bias"],
         _vec_to_chw(sd["fc1_tex.bias"], 256, 4, base_w))

    def resblock(torch_name: str, flax_name: str):
        # flax auto-names follow creation order: the 1x1 shortcut (when the
        # channel count changes) is created first -> Conv_0
        sub_p: dict = {}
        sub_s: dict = {}
        has_shortcut = f"{torch_name}.shortcut.weight" in sd
        base = 1 if has_shortcut else 0
        if has_shortcut:
            _put(sub_p, ["Conv_0", "kernel"], _conv(sd[f"{torch_name}.shortcut.weight"]))
        _put(sub_p, [f"Conv_{base}", "kernel"], _conv(sd[f"{torch_name}.conv1.weight"]))
        _bn(sd, f"{torch_name}.bn1", sub_p, sub_s, ["BatchNorm_0"])
        _put(sub_p, [f"Conv_{base + 1}", "kernel"], _conv(sd[f"{torch_name}.conv2.weight"]))
        _bn(sd, f"{torch_name}.bn2", sub_p, sub_s, ["BatchNorm_1"])
        params[flax_name] = sub_p
        stats[flax_name] = sub_s

    resblock("blk1", "ResBlock_0")
    resblock("blk2", "ResBlock_1")
    resblock("blk3", "ResBlock_2")
    for name in ("blk3b_tex", "blk3c_tex", "blk4_mesh", "blk4_tex", "blk5_tex"):
        if f"{name}.conv1.weight" in sd:
            resblock(name, name)
    for name in ("conv_mesh", "conv_tex"):
        _put(params, [name, "kernel"], _conv(sd[f"{name}.weight"]))
        _put(params, [name, "bias"], np.asarray(sd[f"{name}.bias"], np.float32))
    return {"params": params, "batch_stats": stats}


def convert_generator(sd: Mapping, has_mesh_head: bool = True) -> dict:
    """Reference GAN Generator state dict -> flax variables.

    Spectral-norm convs in torch store ``weight_orig`` + ``weight_u``; flax
    ``nn.SpectralNorm`` keeps the raw kernel in params and u/sigma in
    ``batch_stats`` under ``<layer>/kernel/{u,sigma}``.  We load
    ``weight_orig`` as the kernel and seed u from ``weight_u`` (sigma is
    recomputed on the first forward).
    """
    params: dict = {}
    stats: dict = {}

    def dense(tname, fpath):
        _put(params, fpath + ["kernel"], _dense(sd[f"{tname}.weight"]))
        if f"{tname}.bias" in sd:
            _put(params, fpath + ["bias"], np.asarray(sd[f"{tname}.bias"], np.float32))

    def embed(tname, fpath):
        if f"{tname}.weight" in sd:
            _put(params, fpath + ["embedding"],
                 np.asarray(sd[f"{tname}.weight"], np.float32))

    def sn_conv(tname, block: str, conv_idx: int, sn_idx: int):
        w = sd.get(f"{tname}.weight_orig", sd.get(f"{tname}.weight"))
        _put(params, [block, f"Conv_{conv_idx}", "kernel"], _conv(w))
        if f"{tname}.bias" in sd:
            _put(params, [block, f"Conv_{conv_idx}", "bias"],
                 np.asarray(sd[f"{tname}.bias"], np.float32))
        if f"{tname}.weight_u" in sd:
            u = np.asarray(sd[f"{tname}.weight_u"], np.float32)[None]
            # flax SpectralNorm stores flattened "<layer>/kernel/{u,sigma}"
            _put(stats, [block, f"SpectralNorm_{sn_idx}",
                         f"Conv_{conv_idx}/kernel/u"], u)
            _put(stats, [block, f"SpectralNorm_{sn_idx}",
                         f"Conv_{conv_idx}/kernel/sigma"],
                 np.ones((), np.float32))

    def cond_norm(tname, fpath):
        dense(f"{tname}.fc_gamma", fpath + ["fc_gamma"])
        dense(f"{tname}.fc_beta", fpath + ["fc_beta"])
        if f"{tname}.norm.running_mean" in sd:
            # ConditionalNorm's BatchNorm stats live under the block in the
            # batch_stats collection
            block, norm_name = fpath
            _put(stats, [block, norm_name, "BatchNorm_0", "mean"],
                 np.asarray(sd[f"{tname}.norm.running_mean"], np.float32))
            _put(stats, [block, norm_name, "BatchNorm_0", "var"],
                 np.asarray(sd[f"{tname}.norm.running_var"], np.float32))

    def resblock_up(tname, fname):
        has_shortcut = (f"{tname}.shortcut.weight_orig" in sd
                        or f"{tname}.shortcut.weight" in sd)
        base = 1 if has_shortcut else 0
        if has_shortcut:
            sn_conv(f"{tname}.shortcut", fname, 0, 0)
        sn_conv(f"{tname}.conv1", fname, base, base)
        sn_conv(f"{tname}.conv2", fname, base + 1, base + 1)
        cond_norm(f"{tname}.norm1", [fname, "norm1"])
        cond_norm(f"{tname}.norm2", [fname, "norm2"])

    # fc's output is viewed as a (512, 8, W) CHW base map (``gan.py:385``);
    # flax reshapes (8, W, 512) — permute output columns + bias
    w_fc = np.asarray(sd["fc.weight"])
    base_w = w_fc.shape[0] // (512 * 8)
    _put(params, ["fc", "kernel"], _dense_to_chw(w_fc, 512, 8, base_w))
    _put(params, ["fc", "bias"], _vec_to_chw(sd["fc.bias"], 512, 8, base_w))
    embed("emb_class", ["emb_class"])
    embed("emb_color", ["emb_color"])
    for tname, fname in [
        ("blk1", "blk1"), ("blk2", "blk2"), ("blk3a", "blk3a"),
        ("blk3b", "blk3b"), ("blk3c", "blk3c"), ("blk4", "blk4"),
        ("blk5", "blk5"), ("blk6", "blk6"), ("blk3_mesh", "blk3_mesh"),
    ]:
        if f"{tname}.conv1.weight_orig" in sd or f"{tname}.conv1.weight" in sd:
            resblock_up(tname, fname)
    for tname, fname in [("conv_final", "conv_final"), ("conv_mesh", "conv_mesh")]:
        if f"{tname}.weight" in sd:
            _put(params, [fname, "kernel"], _conv(sd[f"{tname}.weight"]))
            _put(params, [fname, "bias"], np.asarray(sd[f"{tname}.bias"], np.float32))
    return {"params": params, "batch_stats": stats}


def convert_discriminator(sd: Mapping) -> dict:
    """Reference ``MultiScaleDiscriminator`` state dict -> flax variables.

    Reference structure (``code/models/gan.py:235-260``): ``d1`` (full-res
    TextureDiscriminator, convs ``conv1..conv5``), ``d2`` (MeshDiscriminator
    ``conv1..conv4`` or a downsampled TextureDiscriminator when
    ``texture_only``), optional ``d3``.  All convs are spectral-norm wrapped;
    ``norm_d='instance'`` adds affine InstanceNorm params (``bn2..bn4`` ->
    flax GroupNorm(group_size=1) scale/bias); projection conditioning adds
    ``projector``/``projector_col1`` embeddings.
    """
    params: dict = {}
    stats: dict = {}

    def sn_conv(tname: str, dname: str, idx: int):
        w = sd.get(f"{tname}.weight_orig", sd.get(f"{tname}.weight"))
        _put(params, [dname, f"Conv_{idx}", "kernel"], _conv(w))
        if f"{tname}.bias" in sd:
            _put(params, [dname, f"Conv_{idx}", "bias"],
                 np.asarray(sd[f"{tname}.bias"], np.float32))
        if f"{tname}.weight_u" in sd:
            u = np.asarray(sd[f"{tname}.weight_u"], np.float32)[None]
            _put(stats, [dname, f"SpectralNorm_{idx}",
                         f"Conv_{idx}/kernel/u"], u)
            _put(stats, [dname, f"SpectralNorm_{idx}",
                         f"Conv_{idx}/kernel/sigma"], np.ones((), np.float32))

    for d in ("d1", "d2", "d3"):
        if f"{d}.conv1.weight_orig" not in sd and f"{d}.conv1.weight" not in sd:
            continue
        n_convs = 5 if f"{d}.conv5.weight_orig" in sd or f"{d}.conv5.weight" in sd else 4
        for i in range(n_convs):
            sn_conv(f"{d}.conv{i + 1}", d, i)
        for bn in ("bn2", "bn3", "bn4"):
            if f"{d}.{bn}.weight" in sd:  # affine InstanceNorm -> GroupNorm
                _put(params, [d, bn, "scale"],
                     np.asarray(sd[f"{d}.{bn}.weight"], np.float32))
                _put(params, [d, bn, "bias"],
                     np.asarray(sd[f"{d}.{bn}.bias"], np.float32))
        for emb in ("projector", "projector_col1"):
            if f"{d}.{emb}.weight" in sd:
                _put(params, [d, emb, "embedding"],
                     np.asarray(sd[f"{d}.{emb}.weight"], np.float32))
    return {"params": params, "batch_stats": stats}


def convert_pointcloud_encoder(sd: Mapping, image_size: int) -> dict:
    """Reference Pipeline-A ``Encoder`` state dict -> flax variables.

    Reference structure (``code/models/encoder.py:17-43``): nine
    bias+ReLU convs (``network_architecture.{i}.0``; each
    ``BasicBlocks.convolutional`` is Sequential(conv, act, norm) with
    Identity norm when bias=True) then Flatten -> Linear -> ReLU -> Linear
    (``features.{1,3}``).  The first Linear's input ordering differs by
    layout: torch flattens (C, H, W), flax NHWC flattens (H, W, C) — its
    kernel rows are permuted accordingly.
    """
    params: dict = {}
    for i in range(9):
        pre = f"network_architecture.{i}.0"
        _put(params, [f"Conv_{i}", "kernel"], _conv(sd[f"{pre}.weight"]))
        _put(params, [f"Conv_{i}", "bias"],
             np.asarray(sd[f"{pre}.bias"], np.float32))
    ch = np.asarray(sd["network_architecture.8.0.weight"]).shape[0]
    hw = image_size // 32  # five stride-2 convs
    w = np.asarray(sd["features.1.weight"], np.float32)  # (1024, C*H*W)
    w = w.reshape(w.shape[0], ch, hw, hw).transpose(0, 2, 3, 1)
    _put(params, ["Dense_0", "kernel"], w.reshape(w.shape[0], -1).T)
    _put(params, ["Dense_0", "bias"],
         np.asarray(sd["features.1.bias"], np.float32))
    _put(params, ["Dense_1", "kernel"], _dense(sd["features.3.weight"]))
    _put(params, ["Dense_1", "bias"],
         np.asarray(sd["features.3.bias"], np.float32))
    return {"params": params}


def convert_pose_decoder(sd: Mapping, num_candidates: int) -> dict:
    """Reference ``PoseDecoder`` state dict -> flax variables.

    Mapping (``code/models/pose_decoder.py:29-43`` /
    ``basic_blocks.py:36-49``): ``ensemble_of_pose_regressors.0`` ->
    ``ensemble_trunk``; ``predictors.{k}.{0,2,4}`` -> ``head_{k}.Dense_{0,1,2}``;
    ``student_predictor.0`` -> ``student_trunk``; ``student_predictor.2.{0,2,4}``
    -> ``student_head.Dense_{0,1,2}``.
    """
    params: dict = {}

    def linear(tname: str, fpath: list[str]) -> None:
        _put(params, fpath + ["kernel"], _dense(sd[f"{tname}.weight"]))
        _put(params, fpath + ["bias"],
             np.asarray(sd[f"{tname}.bias"], np.float32))

    linear("ensemble_of_pose_regressors.0", ["ensemble_trunk"])
    linear("student_predictor.0", ["student_trunk"])
    for j, idx in enumerate((0, 2, 4)):
        linear(f"student_predictor.2.{idx}", ["student_head", f"Dense_{j}"])
    for k in range(num_candidates):
        for j, idx in enumerate((0, 2, 4)):
            linear(f"predictors.{k}.{idx}", [f"head_{k}", f"Dense_{j}"])
    return {"params": params}


def convert_text_encoder(sd: Mapping):
    """AttnGAN ``RNN_Encoder`` state dict -> (flax params, config kwargs).

    The reference loads ``cache/cub/text_encoder200.pth`` into an AttnGAN
    bidirectional-LSTM text encoder (``code/main.py:539,560-568``; the class
    itself is missing from the repo — SURVEY.md §2.1 bug list).  Expected
    keys: ``encoder.weight`` (vocab, ninput) and torch-LSTM
    ``rnn.{weight,bias}_{ih,hh}_l0[_reverse]``.

    Returns ``(params, cfg)`` where cfg has the inferred ``vocab_size`` /
    ``embedding_dim`` / ``hidden_dim`` for ``models.text_encoder.TextEncoder``
    (construct with exactly these or apply() will shape-error).

    Gate mapping: torch packs (4H, in) rows in i,f,g,o order; flax
    OptimizedLSTMCell splits them into per-gate dense kernels ``i{i,f,g,o}``
    (input, no bias) and ``h{i,f,g,o}`` (hidden, carries the combined
    ``b_ih + b_hh`` bias).
    """
    emb = np.asarray(sd["encoder.weight"], np.float32)
    vocab_size, embedding_dim = emb.shape
    hidden_dim = np.asarray(sd["rnn.weight_hh_l0"]).shape[1]

    params: dict = {"embed": {"embedding": emb}}

    def lstm(cell_name: str, suffix: str) -> None:
        w_ih = np.asarray(sd[f"rnn.weight_ih_l0{suffix}"], np.float32)
        w_hh = np.asarray(sd[f"rnn.weight_hh_l0{suffix}"], np.float32)
        bias = (
            np.asarray(sd[f"rnn.bias_ih_l0{suffix}"], np.float32)
            + np.asarray(sd[f"rnn.bias_hh_l0{suffix}"], np.float32)
        )
        cell: dict = {}
        H = hidden_dim
        for g, gate in enumerate("ifgo"):
            rows = slice(g * H, (g + 1) * H)
            cell[f"i{gate}"] = {"kernel": w_ih[rows].T}
            cell[f"h{gate}"] = {"kernel": w_hh[rows].T, "bias": bias[rows]}
        params[cell_name] = cell

    lstm("OptimizedLSTMCell_0", "")  # forward direction
    lstm("OptimizedLSTMCell_1", "_reverse")
    cfg = dict(vocab_size=vocab_size, embedding_dim=embedding_dim,
               hidden_dim=hidden_dim)
    return params, cfg


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth file (CPU, weights only) -> plain dict of numpy."""
    import torch

    chk = torch.load(path, map_location="cpu", weights_only=False)
    return chk


def tree_shapes(tree) -> dict:
    """Debug helper: pytree -> nested dict of shapes."""
    if isinstance(tree, Mapping):
        return {k: tree_shapes(v) for k, v in tree.items()}
    return tuple(np.shape(tree))
