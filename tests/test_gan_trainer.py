import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.models.gan import GANConfig
from im23d_tpu.parallel.mesh import make_mesh
from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer


@pytest.fixture(scope="module")
def trainer():
    cfg = GANTrainConfig(
        model=GANConfig(texture_resolution=128, mesh_resolution=32, n_classes=(5,)),
        batch_size=2,
    )
    template = MeshTemplate(segments=16, rings=8)
    return GANTrainer(cfg, template=template, mesh=make_mesh(jax.devices()[:1]))


def fake_batch(n=2, res=128, mesh_res=32, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        texture=rng.rand(n, res, res, 3).astype(np.float32) * 2 - 1,
        alpha=(rng.rand(n, res, res, 1) > 0.4).astype(np.float32),
        mesh=rng.randn(n, mesh_res, mesh_res, 3).astype(np.float32) * 0.02,
    )


@pytest.mark.slow
def test_gan_alternation_and_losses(trainer):
    batch = fake_batch()
    l0 = trainer.train_step(batch)  # it 0 -> G step
    assert "g_loss" in l0 and np.isfinite(float(l0["g_loss"]))
    assert np.isfinite(float(l0["flat_loss"]))
    l1 = trainer.train_step(batch)  # it 1 -> D step
    assert "d_fake" in l1 and np.isfinite(float(l1["d_fake"]))
    l2 = trainer.train_step(batch)  # it 2 -> D step
    assert "d_real" in l2
    l3 = trainer.train_step(batch)  # it 3 -> G step again
    assert "g_loss" in l3
    assert trainer.total_it == 4


def test_gan_ema_moves_toward_generator(trainer):
    # after steps, EMA differs from raw but is finite
    leaves = jax.tree_util.tree_leaves(trainer.g_ema["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_gan_inference(trainer):
    z = jnp.zeros((2, trainer.mcfg.latent_dim))
    tex, mesh = trainer.generate(z)
    assert tex.shape == (2, 128, 128, 3)
    assert mesh.shape == (2, 32, 32, 3)


def test_truncation_sampling(trainer):
    z = trainer.truncation_sample(jax.random.PRNGKey(0), 8, 1.0)
    assert z.shape == (8, trainer.mcfg.latent_dim)
    assert float(jnp.abs(z).max()) <= 1.0 + 1e-6


def test_lr_factor_schedule(trainer):
    cfg = trainer.cfg
    trainer.epoch = 0
    assert trainer._lr_factor() == 1.0
    # emulate decay regime
    object.__setattr__(trainer, "epoch", 0)


def test_gan_checkpoint_roundtrip(trainer, tmp_path):
    trainer.workdir = str(tmp_path)
    trainer.save()
    it = trainer.total_it
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.g_params)[0])
    trainer.train_step(fake_batch(seed=3))
    trainer.restore()
    assert trainer.total_it == it
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.g_params)[0])
    np.testing.assert_array_equal(p0, p1)


@pytest.mark.slow
def test_gan_text_conditional_steps():
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    cfg = GANTrainConfig(
        model=GANConfig(texture_resolution=128, conditional_text=True,
                        text_embedding_dim=32),
        batch_size=2, text_vocab_size=50, text_max_length=6,
    )
    t = GANTrainer(
        cfg, template=MeshTemplate(segments=8, rings=4),
        mesh=make_mesh(jax.devices()[:1]),
    )
    rng = np.random.RandomState(0)
    batch = dict(
        texture=rng.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1,
        alpha=(rng.rand(2, 128, 128, 1) > 0.4).astype(np.float32),
        mesh=rng.randn(2, 32, 32, 3).astype(np.float32) * 0.02,
        caption=rng.randint(0, 50, (2, 6)).astype(np.int32),
    )
    l0 = t.train_step(batch)  # G
    assert np.isfinite(float(l0["g_loss"]))
    l1 = t.train_step(batch)  # D
    assert np.isfinite(float(l1["d_fake"]))
    tex, mesh = t.generate(
        jnp.zeros((2, cfg.model.latent_dim)),
        caption_tokens=batch["caption"],
    )
    assert tex.shape == (2, 128, 128, 3)


@pytest.mark.slow
def test_fid_activations_score_tail_batch(trainer):
    """activations_for_batches pads a tail batch to the compiled shape and
    slices back: every dataset image contributes exactly one activation."""
    from im23d_tpu.train.gan_eval import FIDEvaluator

    evaluator = FIDEvaluator(trainer, trainer.template, evaluation_res=75)
    rng = np.random.RandomState(0)

    def pose_batch(n):
        rot = rng.randn(n, 4).astype(np.float32)
        rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
        return dict(
            scale=np.full((n, 1), 0.7, np.float32),
            translation=np.zeros((n, 3), np.float32),
            rotation=rot,
        )

    acts = evaluator.activations_for_batches([pose_batch(2), pose_batch(1)])
    assert acts["combined"].shape[0] == 3


@pytest.mark.slow
def test_gan_resume_equivalence(trainer, tmp_path):
    """Resume-from-checkpoint replays the exact training trajectory: a
    restored trainer produces bitwise-close losses for the same batches
    (catches any state omitted from the checkpoint tree)."""
    trainer.save(workdir=str(tmp_path))
    batches = [fake_batch(seed=100 + i) for i in range(3)]
    first = [
        {k: float(v) for k, v in trainer.train_step(b).items()}
        for b in batches
    ]

    resumed = GANTrainer(
        trainer.cfg, template=trainer.template,
        mesh=make_mesh(jax.devices()[:1]),
    )
    resumed.restore(workdir=str(tmp_path))
    assert resumed.total_it == trainer.total_it - len(batches)
    second = [
        {k: float(v) for k, v in resumed.train_step(b).items()}
        for b in batches
    ]
    for a, b in zip(first, second):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(b[k], a[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"loss {k} diverged on resume")
