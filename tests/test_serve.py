"""Serving-artifact roundtrip: export -> deserialize -> identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.models.gan import GANConfig
from im23d_tpu.parallel.mesh import make_mesh
from im23d_tpu.serve import (
    export_gan_inference,
    export_reconstruction_inference,
    load_artifact,
    save_artifact,
)
from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer


def test_artifact_roundtrip_simple(tmp_path):
    w = jnp.asarray(np.random.RandomState(0).randn(4, 4), jnp.float32)

    def fn(x):
        return jnp.tanh(x @ w)

    x = jnp.ones((2, 4), jnp.float32)
    path = str(tmp_path / "fn.sx")
    save_artifact(path, fn, (x,), platforms=("cpu",))
    served = load_artifact(path)
    np.testing.assert_allclose(
        np.asarray(served(x)), np.asarray(fn(x)), atol=1e-6
    )


@pytest.mark.slow
def test_gan_export_matches_trainer(tmp_path):
    cfg = GANTrainConfig(
        model=GANConfig(texture_resolution=64, mesh_resolution=16,
                        n_classes=(3,), conditional_class=True),
        batch_size=2,
    )
    trainer = GANTrainer(cfg, template=MeshTemplate(segments=16, rings=8),
                         mesh=make_mesh(jax.devices()[:1]))
    path = str(tmp_path / "gen.sx")
    export_gan_inference(trainer, batch_size=2, path=path, platforms=("cpu",))

    z = jnp.asarray(np.random.RandomState(1).randn(2, cfg.model.latent_dim),
                    jnp.float32)
    c = jnp.zeros((2, 1), jnp.int32)
    tex0, mesh0 = trainer.generate(z, c)
    tex1, mesh1 = load_artifact(path)(z, c)
    np.testing.assert_allclose(np.asarray(tex0), np.asarray(tex1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mesh0), np.asarray(mesh1),
                               atol=1e-5)


@pytest.mark.slow
def test_recon_export_matches_trainer(tmp_path):
    trainer = ReconTrainer(
        ReconConfig(batch_size=2, image_resolution=64, texture_resolution=64,
                    mesh_resolution=8, optimize_deltas=False),
        dataset_size=4,
        template=MeshTemplate(segments=16, rings=8),
        mesh=make_mesh(jax.devices()[:1]),
    )
    path = str(tmp_path / "recon.sx")
    export_reconstruction_inference(trainer, batch_size=2, path=path,
                                    platforms=("cpu",))
    images = jnp.asarray(
        np.random.RandomState(2).rand(2, 64, 64, 4), jnp.float32
    )
    tex0, mesh0 = trainer.predict(images)
    tex1, mesh1 = load_artifact(path)(images)
    np.testing.assert_allclose(np.asarray(tex0), np.asarray(tex1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mesh0), np.asarray(mesh1),
                               atol=1e-5)
