import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.parallel.mesh import make_mesh
from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer, transform_vertices


def test_transform_vertices_matches_reference():
    import torch

    # reference transform_vertices (run_reconstruction.py:237-252) with
    # optimize_deltas + optimize_z0
    rng = np.random.RandomState(0)
    B, V = 3, 20
    vtx = rng.randn(B, V, 3).astype(np.float32) * 0.2
    scale = rng.rand(B).astype(np.float32) + 0.5
    trans = rng.randn(B, 3).astype(np.float32) * 0.1
    rot = rng.randn(B, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    t_delta = rng.randn(B, 3).astype(np.float32) * 0.01
    s_delta = rng.randn(B).astype(np.float32) * 0.01
    z0 = (1.0 + np.exp(rng.randn(B, 1))).astype(np.float32)

    ours = np.asarray(
        transform_vertices(
            jnp.asarray(vtx), jnp.asarray(scale), jnp.asarray(trans),
            jnp.asarray(rot), jnp.asarray(t_delta), jnp.asarray(s_delta),
            jnp.asarray(z0),
        )
    )

    # torch reference
    def qrot_t(q, v):
        qvec = q[:, 1:].unsqueeze(1).expand(-1, v.shape[1], -1)
        uv = torch.cross(qvec, v, dim=2)
        uuv = torch.cross(qvec, uv, dim=2)
        return v + 2 * (q[:, :1].unsqueeze(1) * uv + uuv)

    vt = torch.tensor(vtx)
    st = torch.tensor(scale) + torch.tensor(s_delta)
    out = qrot_t(torch.tensor(rot), st.view(B, 1, 1) * vt)
    out = out + (torch.tensor(trans) + torch.tensor(t_delta)).unsqueeze(1)
    out = out * torch.tensor([1.0, -1.0, -1.0])
    z = out[:, :, 2:]
    z0_t = torch.tensor(z0).unsqueeze(-1)
    factor = (z0_t + z / 2) / (z0_t - z / 2)
    expected = torch.cat((out[:, :, :2] * factor, z), dim=2).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


@pytest.fixture(scope="module")
def trainer():
    cfg = ReconConfig(
        image_resolution=64, texture_resolution=64, batch_size=2, epochs=2,
        optimize_deltas=True,
    )
    return ReconTrainer(
        cfg, dataset_size=10, template=MeshTemplate(segments=16, rings=8),
        mesh=make_mesh(jax.devices()[:1]),
    )


def recon_batch(n=2, res=64, seed=0, ds=10):
    rng = np.random.RandomState(seed)
    rot = rng.randn(n, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    return dict(
        image=rng.rand(n, res, res, 4).astype(np.float32),
        scale=np.full((n,), 0.7, np.float32),
        translation=np.zeros((n, 3), np.float32),
        rotation=rot,
        idx=rng.randint(0, 2 * ds, size=(n,)).astype(np.int32),
    )


@pytest.mark.slow
def test_recon_train_step_and_losses(trainer):
    losses = trainer.train_step(recon_batch())
    for key in ("recon_loss", "flat_loss", "iou"):
        assert np.isfinite(float(losses[key])), key
    assert trainer.total_it == 1
    # flat warm-up decays
    assert trainer.flat_warmup == 9.9


def test_recon_loss_decreases(trainer):
    batch = recon_batch(seed=1)
    first = float(trainer.train_step(batch)["recon_loss"])
    for _ in range(5):
        last = float(trainer.train_step(batch)["recon_loss"])
    assert last < first


def test_recon_eval_and_predict(trainer):
    batch = recon_batch(seed=2)
    losses, x_fake = trainer.eval_step(batch)
    assert x_fake.shape == (2, 64, 64, 4)
    assert np.isfinite(float(losses["iou"]))
    tex, mesh_map = trainer.predict(batch["image"])
    assert tex.shape[0] == 2 and mesh_map.shape[1:] == (32, 32, 3)


def test_recon_checkpoint_roundtrip(trainer, tmp_path):
    trainer.workdir = str(tmp_path)
    trainer.save()
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]).copy()
    trainer.train_step(recon_batch(seed=3))
    trainer.restore()
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
    np.testing.assert_array_equal(p0, p1)


def test_lr_schedule(trainer):
    trainer.epoch = 0
    assert trainer._lr_factor() == 1.0
    trainer.epoch = 250
    assert trainer._lr_factor() == 0.5
    trainer.epoch = 500
    assert trainer._lr_factor() == 0.25
    trainer.epoch = 0


def test_render_multiview_grid(trainer):
    batch = recon_batch(seed=4)
    tex, mesh_map = trainer.predict(batch["image"])
    raw_vtx = trainer.template.get_vertex_positions(mesh_map)
    grid = trainer.render_multiview(raw_vtx, tex, idx=0)
    assert grid.shape == (2 * 64, 4 * 64, 3)
    assert np.isfinite(grid).all()
    assert grid.max() <= 1.0 and grid.min() >= 0.0


@pytest.mark.slow
def test_evaluate_keeps_tail_batch_exact(trainer):
    """A val set not divisible by batch_size scores every image: the padded
    tail (weight-0 pads) gives the same means as an unpadded split."""
    full = recon_batch(n=4, seed=5)

    def split(sizes):
        out, start = [], 0
        for s in sizes:
            out.append({k: v[start:start + s] for k, v in full.items()})
            start += s
        return out

    a = trainer.evaluate(split([2, 2]))       # two full batches
    b = trainer.evaluate(split([2, 1, 1]))    # two tail batches padded
    for k in a:
        np.testing.assert_allclose(b[k], a[k], rtol=2e-5, atol=1e-6)
