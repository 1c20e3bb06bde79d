import jax
import jax.numpy as jnp
import pytest
import numpy as np

from im23d_tpu.losses.gan_losses import flatness_loss, gan_loss
from im23d_tpu.models.gan import (
    GANConfig,
    Generator,
    MultiScaleDiscriminator,
    positional_encoding,
)

TINY = GANConfig(texture_resolution=128, mesh_resolution=32, n_classes=(7,))


def test_positional_encoding_matches_reference():
    import torch

    # reference positional_encoding (gan.py:9-20), NCHW there
    def ref(Ny, Nx):
        symmetric = Nx == Ny // 2
        Nx = Ny
        ty = np.linspace(0, np.pi, Ny, endpoint=False)
        tx = np.linspace(-np.pi, np.pi, Nx, endpoint=False)
        Y, X = np.meshgrid(tx, ty)
        result = np.stack((np.cos(X), np.sin(X), np.cos(Y), np.sin(Y)))
        if symmetric:
            return result[:, :, result.shape[2] // 4 : -result.shape[2] // 4]
        return result

    for ny, nx in [(32, 32), (32, 16), (64, 64)]:
        ours = positional_encoding(ny, nx)
        expected = ref(ny, nx).transpose(1, 2, 0)
        np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_generator_wide_hires_widens_only_top_block():
    # GANConfig.wide_hires: the highest-resolution generator block runs at
    # 128 channels (full bf16 lane occupancy) instead of the reference's 64;
    # outputs and every other block are unchanged.  Measured on the real
    # chip as a capacity knob, not a speedup (docs/runs/README.md).
    cfg = GANConfig(texture_resolution=128, n_classes=(7,), wide_hires=True)
    gen = Generator(cfg, mesh_head=True)
    z = jnp.zeros((2, cfg.latent_dim))
    variables = gen.init(jax.random.PRNGKey(0), z, train=False)
    (tex, mesh), _ = gen.apply(variables, z, train=True, mutable=["batch_stats"])
    assert tex.shape == (2, 128, 128, 3)
    assert mesh.shape == (2, 32, 32, 3)
    p = variables["params"]
    assert p["blk6"]["Conv_0"]["kernel"].shape[-1] == 128
    assert p["blk5"]["Conv_0"]["kernel"].shape[-1] == 128  # unchanged
    base = Generator(TINY, mesh_head=True).init(jax.random.PRNGKey(0), z,
                                                train=False)["params"]
    assert base["blk6"]["Conv_0"]["kernel"].shape[-1] == 64


@pytest.mark.slow
def test_generator_shapes_and_symmetry():
    cfg = TINY
    gen = Generator(cfg, mesh_head=True)
    z = jnp.zeros((2, cfg.latent_dim))
    variables = gen.init(jax.random.PRNGKey(0), z, train=False)
    (tex, mesh), _ = gen.apply(variables, z, train=True, mutable=["batch_stats"])
    assert tex.shape == (2, 128, 128, 3)
    assert mesh.shape == (2, 32, 32, 3)
    assert np.abs(np.asarray(tex)).max() <= 1.0
    np.testing.assert_allclose(np.asarray(mesh), 0.0, atol=1e-6)  # zero-init head


def test_generator_conditional_class():
    cfg = GANConfig(texture_resolution=128, conditional_class=True, n_classes=(7,))
    gen = Generator(cfg, mesh_head=True)
    z = jnp.zeros((2, cfg.latent_dim))
    c = jnp.asarray([[0], [3]], jnp.int32)
    variables = gen.init(jax.random.PRNGKey(0), z, c, train=False)
    (tex, mesh), _ = gen.apply(variables, z, c, train=True, mutable=["batch_stats"])
    assert tex.shape == (2, 128, 128, 3)


def test_discriminator_outputs():
    cfg = TINY
    disc = MultiScaleDiscriminator(cfg)
    x = jnp.zeros((2, 128, 128, 4))
    mesh = jnp.zeros((2, 32, 32, 3))
    variables = disc.init(jax.random.PRNGKey(0), x, mesh, train=False)
    (preds, masks), _ = disc.apply(
        variables, x, mesh, train=True, mutable=["batch_stats"]
    )
    assert len(preds) == 2 and len(masks) == 2
    assert preds[0].ndim == 4 and preds[0].shape[-1] == 1
    assert masks[0] is not None  # mask_output default True


def test_gan_loss_hinge_semantics():
    import torch

    rng = np.random.RandomState(0)
    pred = rng.randn(4, 1, 8, 8).astype(np.float32)
    mask = (rng.rand(4, 1, 8, 8) > 0.3).astype(np.float32)

    # reference hinge-with-mask (losses.py:62-92)
    pt = torch.tensor(pred)
    mt = torch.tensor(mask)
    minval = torch.min(pt - 1, torch.zeros_like(pt))
    ret = torch.sum(minval * mt, dim=[1, 2, 3]) / torch.sum(mt, dim=[1, 2, 3])
    expected = float(-torch.mean(ret))

    ours = float(
        gan_loss(
            [jnp.asarray(pred.transpose(0, 2, 3, 1))],
            True, True,
            masks=[jnp.asarray(mask.transpose(0, 2, 3, 1))],
            mode="hinge",
        )
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_gan_loss_weighted_aggregation():
    p1 = jnp.ones((2, 4, 4, 1))
    p2 = jnp.ones((2, 4, 4, 1)) * 3.0
    # generator hinge: -mean -> -1 and -3
    out = float(gan_loss([p1, p2], True, False, weights=[2.0, 1.0], mode="hinge"))
    np.testing.assert_allclose(out, (2 * -1.0 + 1 * -3.0) / 3.0, atol=1e-6)
    out_unw = float(gan_loss([p1, p2], True, False, mode="hinge"))
    np.testing.assert_allclose(out_unw, (-1.0 - 3.0) / 2, atol=1e-6)


def test_flatness_loss_zero_for_sphere_consistency():
    from im23d_tpu.geometry.mesh_template import MeshTemplate

    t = MeshTemplate(segments=16, rings=8)
    # a sphere has smoothly varying normals -> small but nonzero loss;
    # a flat plane variant: all normals identical -> exactly zero
    normals = jnp.ones((1, len(t.mesh.faces), 3)) / np.sqrt(3.0)
    loss = float(flatness_loss(normals, t.ff_j))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    sphere_normals = t.compute_normals(jnp.asarray(t.mesh.vertices)[None])
    loss_sphere = float(flatness_loss(sphere_normals, t.ff_j))
    assert 0 < loss_sphere < 50.0


@pytest.mark.slow
def test_mixed_precision_matches_f32():
    """bfloat16 compute path: same param tree, f32 outputs, close values.

    New capability (no reference analogue — ``code/main.py`` trains pure
    f32); guards the dtype threading through Generator/discriminators.
    """
    z = jax.random.normal(jax.random.PRNGKey(1), (2, TINY.latent_dim))
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = GANConfig(texture_resolution=128, n_classes=(7,), compute_dtype=dt)
        gen = Generator(cfg, mesh_head=True)
        variables = gen.init(jax.random.PRNGKey(0), z, train=False)
        (tex, mesh), _ = gen.apply(variables, z, train=True,
                                   mutable=["batch_stats"])
        # texture rides in the compute dtype (D consumes it directly);
        # the mesh map feeds the f32 geometry path
        assert tex.dtype == cfg.dtype and mesh.dtype == jnp.float32
        tex = tex.astype(jnp.float32)
        disc = MultiScaleDiscriminator(cfg)
        x = jnp.concatenate([tex, jnp.ones_like(tex[..., :1])], axis=-1)
        dv = disc.init(jax.random.PRNGKey(0), x, mesh, train=False)
        (preds, masks), _ = disc.apply(dv, x, mesh, train=True,
                                       mutable=["batch_stats"])
        assert all(p.dtype == jnp.float32 for p in preds)
        assert all(m.dtype == jnp.float32 for m in masks if m is not None)
        outs[dt] = (tex, [p.mean() for p in preds])
    # same init (param_dtype f32 in both); bf16 forward stays close
    np.testing.assert_allclose(
        np.asarray(outs["float32"][0]), np.asarray(outs["bfloat16"][0]), atol=0.2
    )
    for a, b in zip(outs["float32"][1], outs["bfloat16"][1]):
        np.testing.assert_allclose(float(a), float(b), atol=0.05)


def test_discriminator_alpha_mask_path_matches_slice():
    """Masks pooled from the passed alpha == masks sliced from channel 3.

    The trainer passes the alpha it already holds so the critics avoid a
    full-res slice of the tiled input; the two pooling routes must agree.
    """
    cfg = GANConfig(texture_resolution=128, n_classes=(7,))
    rng = np.random.RandomState(3)
    tex = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    alpha = jnp.asarray(rng.rand(2, 128, 128, 1), jnp.float32)
    mesh = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    x = jnp.concatenate([tex * alpha, alpha], axis=-1)
    disc = MultiScaleDiscriminator(cfg)
    dv = disc.init(jax.random.PRNGKey(0), x, mesh, train=False)
    (p_slice, m_slice), _ = disc.apply(dv, x, mesh, train=True,
                                       mutable=["batch_stats"])
    (p_alpha, m_alpha), _ = disc.apply(dv, x, mesh, train=True, alpha=alpha,
                                       mutable=["batch_stats"])
    for a, b in zip(p_slice, p_alpha):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(m_slice, m_alpha):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
