"""End-to-end tests of the ShapeNet unsupervised pipeline (Pipeline A)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.data.synthetic import SyntheticSilhouettes
from im23d_tpu.losses.effective import unsupervised_loss
from im23d_tpu.models.pointcloud_nets import UnsupervisedPart
from im23d_tpu.ops.pointcloud import keep_mask
from im23d_tpu.parallel.mesh import make_mesh
from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

TINY = dict(
    image_size=32,
    voxel_size=16,
    num_points=128,
    num_views=2,
    num_candidates=3,
    batch_size=2,
    total_steps=10,
    eval_every=1000,
    log_every=1000,
)


def tiny_config(**kw) -> ShapeNetConfig:
    return ShapeNetConfig(**{**TINY, **kw})


def tiny_batch(cfg: ShapeNetConfig, seed=0):
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views,
        n_points=64, seed=seed,
    )
    return data.next_batch()


def test_model_output_shapes():
    cfg = tiny_config()
    model = UnsupervisedPart(
        num_points=cfg.num_points,
        num_candidates=cfg.num_candidates,
        num_views=cfg.num_views,
    )
    B, V, H = cfg.batch_size, cfg.num_views, cfg.image_size
    imgs = jnp.zeros((B, H, H, 3))
    pose_imgs = jnp.zeros((B * V, H, H, 3))
    params = model.init(jax.random.PRNGKey(0), imgs, pose_imgs)
    out = model.apply(params, imgs, pose_imgs)
    assert out["point_cloud"].shape == (B, cfg.num_points, 3)
    assert out["scale"].shape == (B, 1)
    assert out["ensemble_q"].shape == (B * V, cfg.num_candidates, 4)
    assert out["student_q"].shape == (B * V, 4)
    # point cloud within [-0.5, 0.5]
    assert np.abs(np.asarray(out["point_cloud"])).max() <= 0.5


def test_model_bfloat16_compute_close_to_f32():
    """Mixed precision reuses f32 params; outputs stay f32 and close."""
    cfg = tiny_config()
    kw = dict(num_points=cfg.num_points, num_candidates=cfg.num_candidates,
              num_views=cfg.num_views)
    model32 = UnsupervisedPart(**kw)
    model16 = UnsupervisedPart(**kw, compute_dtype="bfloat16")
    B, V, H = cfg.batch_size, cfg.num_views, cfg.image_size
    rng = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(rng, (B, H, H, 3))
    pose_imgs = jax.random.uniform(rng, (B * V, H, H, 3))
    params = model32.init(jax.random.PRNGKey(0), imgs, pose_imgs)
    out32 = model32.apply(params, imgs, pose_imgs)
    out16 = model16.apply(params, imgs, pose_imgs)
    for key in ("point_cloud", "scale", "ensemble_q", "student_q"):
        assert out16[key].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out16[key]), np.asarray(out32[key]),
            atol=0.15, rtol=0.1,
        )


@pytest.mark.slow
def test_unsupervised_loss_train_and_eval():
    cfg = tiny_config()
    model = UnsupervisedPart(
        num_points=cfg.num_points,
        num_candidates=cfg.num_candidates,
        num_views=cfg.num_views,
    )
    batch = tiny_batch(cfg)
    imgs = jnp.asarray(batch["images"], jnp.float32) / 255.0
    pose_imgs = jnp.asarray(batch["pose_input"], jnp.float32) / 255.0
    masks = jnp.asarray(batch["masks"], jnp.float32) / 255.0
    params = model.init(jax.random.PRNGKey(0), imgs, pose_imgs)
    out = model.apply(params, imgs, pose_imgs)
    kw = keep_mask(jax.random.PRNGKey(1), cfg.batch_size, cfg.num_points, jnp.float32(0.5))

    losses, aux = unsupervised_loss(
        out, masks, jnp.float32(2.0), kw, cfg.num_views,
        voxel_size=cfg.voxel_size, training=True,
    )
    assert set(losses) == {"projection_loss", "student_loss", "total_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))
    assert aux["projection"].shape == (
        cfg.batch_size * cfg.num_views, cfg.num_candidates,
        cfg.voxel_size, cfg.voxel_size,
    )
    assert aux["min_indexes"].shape == (cfg.batch_size * cfg.num_views,)

    ev_losses, ev_aux = unsupervised_loss(
        out, masks, jnp.float32(2.0), kw, cfg.num_views,
        voxel_size=cfg.voxel_size, training=False,
    )
    assert np.isfinite(float(ev_losses["projection_loss"]))
    assert ev_aux["projection"].shape == (
        cfg.batch_size * cfg.num_views, cfg.voxel_size, cfg.voxel_size
    )


@pytest.mark.slow
def test_learner_loss_decreases_on_fixed_batch():
    cfg = tiny_config(learning_rate=2e-4)
    learner = ShapeNetLearner(cfg, mesh=make_mesh(jax.devices()[:1]))
    batch = tiny_batch(cfg)
    first = learner.train_step(batch)
    for _ in range(8):
        last = learner.train_step(batch)
    assert float(last["total_loss"]) < float(first["total_loss"])
    assert int(learner.state.step) == 9


@pytest.mark.slow
def test_learner_multidevice_matches_shapes():
    # 8 virtual CPU devices: batch 8 sharded over the mesh.
    assert jax.device_count() >= 8
    cfg = tiny_config(batch_size=8)
    mesh = make_mesh(jax.devices()[:8])
    learner = ShapeNetLearner(cfg, mesh=mesh)
    batch = tiny_batch(cfg)
    losses = learner.train_step(batch)
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.slow
def test_single_vs_multidevice_parity():
    # Same params, same batch, same rng: dp-sharded grads == single device.
    cfg = tiny_config(batch_size=8)
    batch = tiny_batch(cfg)

    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices()[:8])
    l1 = ShapeNetLearner(cfg, mesh=mesh1)
    l8 = ShapeNetLearner(cfg, mesh=mesh8)
    # identical init (same seed)
    r1 = l1.train_step(batch)
    r8 = l8.train_step(batch)
    np.testing.assert_allclose(
        float(r1["total_loss"]), float(r8["total_loss"]), rtol=1e-4
    )


@pytest.mark.slow
def test_2d_mesh_dp_tp_parity():
    """dp x tp 2-D mesh (the __graft_entry__ layout): loss AND post-update
    params match single-device training, proving the tensor-parallel
    param shardings change the partitioning, not the math."""
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = tiny_config(batch_size=8)
    batch = tiny_batch(cfg)

    def param_shardings(path, leaf):
        if leaf.ndim == 2 and leaf.shape[-1] % 2 == 0 and (
            "decoder" in path or "Dense" in path
        ):
            return P(None, "model")
        return None

    mesh2d = Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model")
    )
    l1 = ShapeNetLearner(cfg, mesh=make_mesh(jax.devices()[:1]))
    l2 = ShapeNetLearner(cfg, mesh=mesh2d, param_shardings=param_shardings)
    # at least one kernel actually got a tensor-parallel sharding
    tp_leaves = [
        jax.tree_util.keystr(p)
        for p, leaf in jax.tree_util.tree_leaves_with_path(l2.state.params)
        if getattr(leaf.sharding, "spec", None) == P(None, "model")
    ]
    assert tp_leaves, "no parameter was sharded over the model axis"

    r1 = l1.train_step(batch)
    r2 = l2.train_step(batch)
    np.testing.assert_allclose(
        float(r1["total_loss"]), float(r2["total_loss"]), rtol=1e-4
    )
    # functional parity after the update: the second-step loss exercises the
    # updated params end-to-end.  (Elementwise post-Adam params are brittle:
    # near-zero grads give sign-flipped updates bounded by lr under
    # different shard reduction orders.)
    r1b = l1.train_step(batch)
    r2b = l2.train_step(batch)
    np.testing.assert_allclose(
        float(r1b["total_loss"]), float(r2b["total_loss"]), rtol=1e-2
    )
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(l1.state.params),
        jax.tree_util.tree_leaves_with_path(l2.state.params),
    ):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        # bounded by ~2 Adam steps of lr=1e-3 on disagreeing elements
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=jax.tree_util.keystr(p1),
        )


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    learner = ShapeNetLearner(cfg, workdir=str(tmp_path), mesh=make_mesh(jax.devices()[:1]))
    batch = tiny_batch(cfg)
    learner.train_step(batch)
    learner.train_step(batch)
    path = learner.save()
    assert path

    learner2 = ShapeNetLearner(cfg, workdir=str(tmp_path), mesh=make_mesh(jax.devices()[:1]))
    learner2.restore()
    assert int(learner2.state.step) == 2
    p1 = jax.tree_util.tree_leaves(learner.state.params)
    p2 = jax.tree_util.tree_leaves(learner2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored learner continues training
    out = learner2.train_step(batch)
    assert np.isfinite(float(out["total_loss"]))


@pytest.mark.slow
def test_fit_loop_with_synthetic_data(tmp_path):
    cfg = tiny_config(total_steps=5, log_every=2)
    learner = ShapeNetLearner(cfg, workdir=str(tmp_path), mesh=make_mesh(jax.devices()[:1]))
    data = SyntheticSilhouettes(cfg.batch_size, cfg.image_size, cfg.num_views, n_points=64)
    losses = learner.fit(iter(data), num_steps=5)
    assert np.isfinite(losses["total_loss"])
    assert int(learner.state.step) == 5


def test_projection_grid_logging(tmp_path):
    # the periodic grid must come from the cached jitted renderer (an
    # unjitted apply is hundreds of RPC round trips on a remote TPU) and
    # write masks-on-top / projections-below PNG grids
    cfg = tiny_config()
    learner = ShapeNetLearner(
        cfg, workdir=str(tmp_path), mesh=make_mesh(jax.devices()[:1])
    )
    batch = learner.put_batch(tiny_batch(cfg))
    learner.log_projection_grid(batch, step=7)
    assert learner._grid_fn() is learner._grid_fn()  # built once, cached
    import os

    files = os.listdir(tmp_path / "images")
    assert files == ["renders_00000007.png"]


def test_schedule_endpoints():
    cfg = tiny_config(total_steps=100)
    learner = ShapeNetLearner(cfg, mesh=make_mesh(jax.devices()[:1]))
    p0, s0 = learner._schedules(jnp.asarray(0))
    p1, s1 = learner._schedules(jnp.asarray(100))
    np.testing.assert_allclose(float(p0), cfg.p_schedule[0], atol=1e-6)
    np.testing.assert_allclose(float(p1), cfg.p_schedule[1], atol=1e-6)
    np.testing.assert_allclose(float(s0), cfg.sigma_schedule[0], atol=1e-6)
    np.testing.assert_allclose(float(s1), cfg.sigma_schedule[1], atol=1e-6)


def test_supervised_part_and_loss():
    from im23d_tpu.losses.effective import supervised_loss
    from im23d_tpu.models.pointcloud_nets import SupervisedPart

    cfg = tiny_config()
    model = SupervisedPart(num_points=cfg.num_points)
    B, V, H = cfg.batch_size, cfg.num_views, cfg.image_size
    imgs = jnp.zeros((B, H, H, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["point_cloud"].shape == (B, cfg.num_points, 3)

    rng = np.random.RandomState(0)
    poses = rng.randn(B * V, 4).astype(np.float32)
    poses /= np.linalg.norm(poses, axis=-1, keepdims=True)
    masks = jnp.asarray(rng.rand(B * V, H, H).astype(np.float32))
    losses, aux = supervised_loss(
        out, jnp.asarray(poses), masks, jnp.float32(1.5), None,
        cfg.num_views, voxel_size=cfg.voxel_size,
    )
    assert np.isfinite(float(losses["total_loss"]))
    assert aux["projection"].shape == (B * V, cfg.voxel_size, cfg.voxel_size)


def test_async_rolling_checkpoint_roundtrip(tmp_path):
    """tag='latest' saves are async; restore waits for in-flight writes."""
    import numpy as np

    from im23d_tpu.core.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_async_saves,
    )

    tree = {"w": jnp.arange(12.0).reshape(3, 4), "step": 7}
    save_checkpoint(str(tmp_path), "latest", tree, block=False)
    # immediate restore must see the full write (restore waits internally)
    out = restore_checkpoint(str(tmp_path), "latest",
                             {"w": jnp.zeros((3, 4)), "step": 0})
    np.testing.assert_array_equal(np.asarray(out["w"]),
                                  np.asarray(tree["w"]))
    assert int(out["step"]) == 7
    wait_for_async_saves()


def test_numbered_steps_excludes_rolling_tier(tmp_path):
    from im23d_tpu.core.checkpoint import latest_step, numbered_steps

    root = tmp_path / "run" / "checkpoints"
    for name in ("step_3", "step_10", "step_latest", "curves_3.npz"):
        (root / name).mkdir(parents=True)
    assert numbered_steps(str(tmp_path / "run")) == [3, 10]
    assert latest_step(str(tmp_path / "run")) == 10
    assert numbered_steps(str(tmp_path / "nonexistent")) == []
