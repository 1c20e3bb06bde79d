import jax
import jax.numpy as jnp
import pytest
import numpy as np

from im23d_tpu.models.reconstruction import (
    DatasetParams,
    ReconstructionNetwork,
    upsample_nearest,
)


def test_upsample_nearest_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 6, 3).astype(np.float32)
    ours = np.asarray(upsample_nearest(jnp.asarray(x)))
    expected = (
        F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="nearest")
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(ours, expected)


def test_reconstruction_network_shapes():
    model = ReconstructionNetwork(symmetric=True, texture_res=64)
    x = jnp.zeros((2, 256, 256, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (tex, mesh_map), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert tex.shape == (2, 64, 64, 3)  # half-width synth, symmetrized to square
    assert mesh_map.shape == (2, 32, 32, 3)
    assert np.abs(np.asarray(tex)).max() <= 1.0
    # zero-init mesh conv -> mesh map is exactly zero at init
    np.testing.assert_allclose(np.asarray(mesh_map), 0.0, atol=1e-6)


@pytest.mark.slow
def test_reconstruction_network_higher_res():
    model = ReconstructionNetwork(symmetric=True, texture_res=128)
    x = jnp.zeros((1, 256, 256, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (tex, mesh_map), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert tex.shape == (1, 128, 128, 3)
    assert mesh_map.shape == (1, 32, 32, 3)


def test_reconstruction_symmetry_property():
    # symmetric output: tex[:, :, w] == tex[:, :, 2W-1-w] mirrored about center
    model = ReconstructionNetwork(symmetric=True, texture_res=64)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 256, 256, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (tex, mesh_map), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    tex = np.asarray(tex)
    # even symmetry along width: column k mirrors column W-1-k... the
    # symmetrize op concatenates [flip_half, x, flip_half]; verify the
    # mirror relation holds between the two halves
    W = tex.shape[2]
    np.testing.assert_allclose(tex, np.flip(np.roll(tex, -W // 2, axis=2), axis=2)[
        :, :, np.r_[W - W // 2:W, 0:W - W // 2]
    ], atol=2e-6, rtol=0)


def test_dataset_params_deltas_and_mirror():
    dp = DatasetParams(dataset_size=10, optimize_deltas=True)
    variables = dp.init(jax.random.PRNGKey(0), jnp.arange(4), "deltas")
    # set nonzero params
    params = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.5, variables)
    idx = jnp.asarray([3, 13])  # 13 = mirrored version of 3
    (t, s) = dp.apply(params, idx, "deltas")
    assert t.shape == (2, 3) and s.shape == (2, 1)
    np.testing.assert_allclose(t[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(t[1, 0], -0.5, atol=1e-6)  # mirrored x flip
    np.testing.assert_allclose(t[:, 2], 0.0, atol=1e-6)  # z translation zero


def test_dataset_params_z0():
    dp = DatasetParams(dataset_size=5, optimize_deltas=False, optimize_z0=True)
    variables = dp.init(jax.random.PRNGKey(0), jnp.arange(2), "z0")
    z0 = dp.apply(variables, jnp.asarray([0, 1]), "z0")
    np.testing.assert_allclose(np.asarray(z0), 1.0 + np.e, atol=1e-5)


def test_dataset_params_none_indices_mean():
    dp = DatasetParams(dataset_size=4, optimize_deltas=True)
    variables = dp.init(jax.random.PRNGKey(0), jnp.arange(2), "deltas")
    t, s = dp.apply(variables, None, "deltas")
    assert t.shape == (1, 3) and s.shape == (1, 1)
