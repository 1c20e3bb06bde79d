"""Converter tests: synthetic reference-shaped torch state dicts -> flax."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from im23d_tpu.core.torch_convert import convert_generator, convert_reconstruction
from im23d_tpu.models.gan import GANConfig, Generator
from im23d_tpu.models.reconstruction import ReconstructionNetwork


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.05


def _bn_entries(rng, sd, prefix, ch):
    sd[f"{prefix}.weight"] = _rand(rng, ch) + 1.0
    sd[f"{prefix}.bias"] = _rand(rng, ch)
    sd[f"{prefix}.running_mean"] = _rand(rng, ch)
    sd[f"{prefix}.running_var"] = np.abs(_rand(rng, ch)) + 1.0


def make_recon_state_dict(rng):
    """Reference ReconstructionNetwork(texture_res=64) state dict shapes
    (reconstruction.py:51-96)."""
    sd = {}
    enc = [(64, 4, 5), (128, 64, 3), (256, 128, 3), (512, 256, 3), (64, 512, 3)]
    for i, (o, c, k) in enumerate(enc):
        sd[f"conv{i+1}e.weight"] = _rand(rng, o, c, k, k)
        _bn_entries(rng, sd, f"bn{i+1}e", o)
    sd["fc1e.weight"] = _rand(rng, 256, 64 * 8 * 8)
    _bn_entries(rng, sd, "bnfc1e", 256)
    sd["fc3e.weight"] = _rand(rng, 1024, 256)
    _bn_entries(rng, sd, "bnfc3e", 1024)
    sd["fc1_tex.weight"] = _rand(rng, 4 * 2 * 256, 1024)
    sd["fc1_tex.bias"] = _rand(rng, 4 * 2 * 256)

    def resblock(name, ci, co):
        sd[f"{name}.conv1.weight"] = _rand(rng, ci, ci, 3, 3)
        sd[f"{name}.conv2.weight"] = _rand(rng, co, ci, 3, 3)
        _bn_entries(rng, sd, f"{name}.bn1", ci)
        _bn_entries(rng, sd, f"{name}.bn2", co)
        if ci != co:
            sd[f"{name}.shortcut.weight"] = _rand(rng, co, ci, 1, 1)

    resblock("blk1", 256, 512)
    resblock("blk2", 512, 256)
    resblock("blk3", 256, 256)
    resblock("blk4_mesh", 256, 64)
    resblock("blk4_tex", 256, 128)
    resblock("blk5_tex", 128, 64)
    sd["conv_mesh.weight"] = np.zeros((3, 64, 5, 5), np.float32)
    sd["conv_mesh.bias"] = np.zeros((3,), np.float32)
    sd["conv_tex.weight"] = _rand(rng, 3, 64, 5, 5)
    sd["conv_tex.bias"] = _rand(rng, 3)
    return sd


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda x: jnp.shape(x), t)


@pytest.mark.slow
def test_convert_reconstruction_matches_init_tree():
    rng = np.random.RandomState(0)
    sd = make_recon_state_dict(rng)
    converted = convert_reconstruction(sd)

    model = ReconstructionNetwork(symmetric=True, texture_res=64)
    ref = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 4))
    )
    # same structure and shapes
    assert jax.tree_util.tree_structure(_tree_shapes(converted)) == \
        jax.tree_util.tree_structure(_tree_shapes(ref))
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(converted),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        assert np.shape(a) == np.shape(b), (jax.tree_util.keystr(ka), np.shape(a), np.shape(b))

    # converted weights actually run
    (tex, mesh_map) = model.apply(converted, jnp.zeros((1, 256, 256, 4)), train=False)
    assert np.isfinite(np.asarray(tex)).all()
    # zero-init conv_mesh carried through -> mesh map exactly zero
    np.testing.assert_allclose(np.asarray(mesh_map), 0.0, atol=1e-6)


def test_converted_conv_matches_torch_semantics():
    """The OIHW->HWIO mapping + SAME padding reproduces torch conv2d."""
    import torch
    import torch.nn.functional as F
    import flax.linen as nn

    rng = np.random.RandomState(1)
    w = _rand(rng, 8, 4, 5, 5)  # torch OIHW
    x = rng.randn(2, 16, 16, 4).astype(np.float32)

    conv = nn.Conv(8, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)), use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    expected = F.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
        stride=2, padding=2,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def make_generator_state_dict(rng, tex_res=128, n_classes=5, latent=64):
    """Reference Generator(args, 64) state dict shapes (gan.py:314-426),
    conditional_class, symmetric, mesh head."""
    sd = {}
    emb = latent
    sd["emb_class.weight"] = _rand(rng, n_classes, emb)
    zdim = latent + emb
    sd["fc.weight"] = _rand(rng, 8 * 4 * 512, zdim)
    sd["fc.bias"] = _rand(rng, 8 * 4 * 512)

    def sn(name, o, c, k):
        sd[f"{name}.weight_orig"] = _rand(rng, o, c, k, k)
        sd[f"{name}.weight_u"] = _rand(rng, o)

    def cond_norm(name, ch):
        sd[f"{name}.fc_gamma.weight"] = _rand(rng, ch, zdim)
        sd[f"{name}.fc_gamma.bias"] = _rand(rng, ch)
        sd[f"{name}.fc_beta.weight"] = _rand(rng, ch, zdim)
        sd[f"{name}.fc_beta.bias"] = _rand(rng, ch)
        sd[f"{name}.norm.running_mean"] = _rand(rng, ch)
        sd[f"{name}.norm.running_var"] = np.abs(_rand(rng, ch)) + 1.0

    def blk(name, ci, co):
        cm = min(ci, co)
        sn(f"{name}.conv1", cm, ci, 3)
        sn(f"{name}.conv2", co, cm, 3)
        cond_norm(f"{name}.norm1", cm)
        cond_norm(f"{name}.norm2", co)
        if ci != co:
            sn(f"{name}.shortcut", co, ci, 1)

    blk("blk1", 512, 512)
    blk("blk2", 512, 256)
    blk("blk4", 256, 128)
    blk("blk5", 128, 128)
    blk("blk6", 128, 64)
    blk("blk3_mesh", 256, 64)
    sd["conv_final.weight"] = _rand(rng, 3, 64, 5, 5)
    sd["conv_final.bias"] = _rand(rng, 3)
    sd["conv_mesh.weight"] = np.zeros((3, 64, 5, 5), np.float32)
    sd["conv_mesh.bias"] = np.zeros((3,), np.float32)
    return sd


@pytest.mark.slow
def test_convert_generator_matches_init_tree():
    rng = np.random.RandomState(2)
    sd = make_generator_state_dict(rng)
    converted = convert_generator(sd)

    cfg = GANConfig(texture_resolution=128, conditional_class=True, n_classes=(5,))
    model = Generator(cfg, mesh_head=True)
    ref = jax.jit(lambda r, z, c: model.init(r, z, c, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64)), jnp.zeros((1, 1), jnp.int32)
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(converted),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb), (
            jax.tree_util.keystr(ka), jax.tree_util.keystr(kb))
        assert np.shape(a) == np.shape(b), (jax.tree_util.keystr(ka),)

    z = jnp.zeros((2, 64))
    c = jnp.zeros((2, 1), jnp.int32)
    (tex, mesh), _ = model.apply(converted, z, c, train=False,
                                 mutable=["batch_stats"])
    assert tex.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(tex)).all()
    np.testing.assert_allclose(np.asarray(mesh), 0.0, atol=1e-6)
