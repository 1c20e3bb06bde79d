"""Folded-width head-conv Pallas kernel: parity + gradients (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.ops import conv_pallas
from im23d_tpu.ops.conv_pallas import _pad_input, head_conv_tanh


def _ref(x, k, b, pad_mode="replicate", tanh_out=True):
    pw = (k.shape[1] - 1) // 2
    if pad_mode == "replicate":
        left = jnp.repeat(x[:, :, :1], pw, axis=2)
        right = jnp.repeat(x[:, :, -1:], pw, axis=2)
    else:
        left, right = x[:, :, -pw:], x[:, :, :pw]
    xp = jnp.concatenate([left, x, right], axis=2)
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((pw, pw), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jnp.tanh(y) if tanh_out else y


@pytest.mark.parametrize("pad_mode", ["replicate", "circular"])
def test_head_conv_value_and_grads(pad_mode):
    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 2, 16, 16, 8, 3
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, Cin, Cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)

    y = head_conv_tanh(x, k, b, True, pad_mode)
    y_ref = _ref(x, k, b, pad_mode)
    np.testing.assert_allclose(np.asarray(y[..., :3]), np.asarray(y_ref),
                               atol=2e-6)
    assert float(jnp.abs(y[..., 3]).max()) == 0.0

    co = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    gp = jax.grad(
        lambda *a: jnp.sum(head_conv_tanh(*a, True, pad_mode)[..., :3] * co),
        argnums=(0, 1, 2),
    )(x, k, b)
    gr = jax.grad(
        lambda *a: jnp.sum(_ref(*a, pad_mode) * co), argnums=(0, 1, 2)
    )(x, k, b)
    for name, a, r in zip(("dx", "dkernel", "dbias"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=1e-4,
            err_msg=f"{name} mismatch ({pad_mode})",
        )


def test_head_conv_in_jit_under_vjp():
    """The op composes under jit + value_and_grad (the trainer's usage)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, 8, 3)) * 0.1, jnp.float32)
    b = jnp.zeros((3,), jnp.float32)

    @jax.jit
    def loss(x, k, b):
        return jnp.sum(head_conv_tanh(x, k, b) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, k, b)
    ref = jnp.sum(_ref(x, k, b) ** 2)
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-5)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


@pytest.mark.slow
def test_generator_head_pallas_matches_flax(monkeypatch):
    """Whole-generator forward: Pallas head (forced, interpret) == XLA path."""
    from im23d_tpu.models.gan import GANConfig, Generator

    cfg = GANConfig(texture_resolution=128, mesh_resolution=32,
                    norm_g="batch", n_classes=(3,))
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, cfg.latent_dim))
    variables = gen.init(rng, z, train=False)

    (tex_ref, mesh_ref), _ = gen.apply(
        variables, z, train=False, mutable=["batch_stats"]
    )
    monkeypatch.setattr(conv_pallas, "_FORCE_PALLAS_HEAD", True)
    (tex_p, mesh_p), _ = gen.apply(
        variables, z, train=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(tex_p), np.asarray(tex_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(mesh_p), np.asarray(mesh_ref),
                               atol=1e-5)


@pytest.mark.parametrize("affine", [True, False])
@pytest.mark.parametrize("pad_mode", ["replicate", "circular"])
def test_fused_affine_conv3x3(affine, pad_mode):
    from im23d_tpu.ops.conv_pallas import fused_affine_conv3x3

    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 2, 8, 16, 8, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.float32)
    a = jnp.asarray(1.0 + 0.1 * rng.standard_normal((B, Cin)), jnp.float32)
    bb = jnp.asarray(0.1 * rng.standard_normal((B, Cin)), jnp.float32)

    def ref(x, a, bb, k):
        if a is not None:
            pre = x * a[:, None, None, :] + bb[:, None, None, :]
            act = jnp.where(pre >= 0, pre, 0.2 * pre)
        else:
            act = x
        if pad_mode == "replicate":
            left, right = act[:, :, :1], act[:, :, -1:]
        else:
            left, right = act[:, :, -1:], act[:, :, :1]
        ap = jnp.concatenate([left, act, right], axis=2)
        return jax.lax.conv_general_dilated(
            ap, k, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    aa = a if affine else None
    bbb = bb if affine else None
    y = fused_affine_conv3x3(x, aa, bbb, k, None, pad_mode)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, aa, bbb, k)),
                               atol=3e-6)
    if affine:
        co = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
        gp = jax.grad(
            lambda *s: jnp.sum(fused_affine_conv3x3(*s, None, pad_mode) * co),
            argnums=(0, 1, 2, 3),
        )(x, a, bb, k)
        gr = jax.grad(lambda *s: jnp.sum(ref(*s) * co), argnums=(0, 1, 2, 3))(
            x, a, bb, k
        )
        for name, p, r in zip(("dx", "da", "dbb", "dk"), gp, gr):
            np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                       atol=1e-4, err_msg=name)
