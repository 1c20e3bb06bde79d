"""Cross-replica batch-norm numerics under SPMD sharding.

The reference ships ``sync_batchnorm/batchnorm_reimpl.py`` explicitly "for
testing the numerical stability" of its 740-LoC SyncBN machinery against a
single-device reference (SURVEY.md §4).  Here the same property is a direct
consequence of SPMD: BatchNorm over a batch sharded across 8 devices must
equal BatchNorm on one device.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.parallel.mesh import batch_sharded, make_mesh, replicated


class BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        h = nn.Conv(8, (3, 3), padding="SAME", use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return nn.relu(h)


def test_sharded_batchnorm_matches_single_device():
    assert jax.device_count() >= 8
    rng = np.random.RandomState(0)
    x = rng.randn(16, 8, 8, 3).astype(np.float32)

    model = BNNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))

    def fwd(v, xx):
        out, new = model.apply(v, xx, train=True, mutable=["batch_stats"])
        return out, new["batch_stats"]

    # single device
    out1, stats1 = jax.jit(fwd)(variables, jnp.asarray(x))

    # batch sharded over 8 devices
    mesh = make_mesh(jax.devices()[:8])
    xs = jax.device_put(jnp.asarray(x), batch_sharded(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    out8, stats8 = jax.jit(fwd)(vs, xs)

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(stats1),
                    jax.tree_util.tree_leaves(stats8)):
        # running statistics computed over the GLOBAL batch on both paths
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_gradients_match_single_device():
    assert jax.device_count() >= 8
    rng = np.random.RandomState(1)
    x = rng.randn(8, 8, 8, 3).astype(np.float32)
    y = rng.randn(8, 8, 8, 8).astype(np.float32)

    model = BNNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))

    def loss(params, stats, xx, yy):
        out, _ = model.apply(
            {"params": params, "batch_stats": stats}, xx, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((out - yy) ** 2)

    g1 = jax.jit(jax.grad(loss))(
        variables["params"], variables["batch_stats"], jnp.asarray(x), jnp.asarray(y)
    )
    mesh = make_mesh(jax.devices()[:8])
    g8 = jax.jit(jax.grad(loss))(
        jax.device_put(variables["params"], replicated(mesh)),
        jax.device_put(variables["batch_stats"], replicated(mesh)),
        jax.device_put(jnp.asarray(x), batch_sharded(mesh)),
        jax.device_put(jnp.asarray(y), batch_sharded(mesh)),
    )
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_batch_pytree_passthrough_is_identity():
    """Re-putting an already-sharded batch must return the SAME arrays.

    ``ShapeNetLearner.fit`` pre-stages device pools and calls
    ``put_batch`` -> ``shard_batch_pytree`` on every step; on a remote-TPU
    tunnel a redundant ``jax.device_put`` per leaf per step costs an RPC
    round trip each (round-4 decay investigation), so correctly-sharded
    leaves pass through untouched.
    """
    import numpy as np

    from im23d_tpu.parallel.mesh import make_mesh, shard_batch_pytree

    mesh = make_mesh(jax.devices()[:4])
    host = dict(a=np.arange(32, dtype=np.float32).reshape(8, 4),
                b=np.zeros((8, 2, 2), np.uint8))
    dev = shard_batch_pytree(host, mesh)
    again = shard_batch_pytree(dev, mesh)
    assert again["a"] is dev["a"] and again["b"] is dev["b"]
    np.testing.assert_array_equal(np.asarray(again["a"]), host["a"])
    # a differently-sharded (fresh host) leaf still gets placed
    mixed = dict(a=dev["a"], b=host["b"])
    out = shard_batch_pytree(mixed, mesh)
    assert out["a"] is dev["a"]
    np.testing.assert_array_equal(np.asarray(out["b"]), host["b"])
